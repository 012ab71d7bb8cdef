#!/bin/bash
# Round-5 TPU queue. Priorities (VERDICT r4 "Next round"): land TPU
# evidence first — (1) bench recapture >= 2.6e9 + slab numbers, (2) the
# kagome-18 curve at full 1024x10 statistics (replacing the r4 CPU
# capture), (3) sk_32_1 sector ED in a bounded dedicated window
# (checkpointed restarts; the only reference system with zero results),
# (4) kagome-36 NN self-training at the reference's 100k-sample config,
# (5) curve tails to 204800 for the remaining systems, (6) the order-2
# SA cluster cell on the slab engine, (7) NQS amplitude pretrain scale.
#
# Hygiene (carried from r4d): ONE pidfile (/tmp/queue_r5.pid); every
# stage is a direct `timeout` child so bench.py's recorded-PID kill tree
# reaps everything; stages never start within 15 min of HARD_END and
# their timeouts are clipped so nothing outlives HARD_END. The backend
# probe loop doubles as the relay watcher: the queue can be launched
# while the relay is DOWN and will start work the moment it answers.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
echo $$ > /tmp/queue_r5.pid
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_r5.log; }
note "queue r5 started (pid $$)"

# no NEW stage after END_TS; nothing may run past HARD_END (the driver's
# bench capture lands after the session; the TPU must be quiet by then)
END_TS=$(date -d '2026-08-19 07:45' +%s)
HARD_END=$(date -d '2026-08-19 08:15' +%s)

probe_backend() {
  until timeout 240 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    note "backend probe failed; retrying in 60s"
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
    sleep 60
  done
  return 0
}

stage() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  local now left
  now=$(date +%s)
  if [ "$now" -ge "$END_TS" ]; then note "deadline; skip $name"; return 1; fi
  for attempt in 1 2; do
    probe_backend || { note "$name: no backend; giving up"; return 1; }
    now=$(date +%s); left=$(( HARD_END - now ))
    [ "$left" -lt 900 ] && { note "hard end near; skip $name"; return 1; }
    [ "$to" -gt "$left" ] && to=$left
    timeout "$to" "$@" > "/tmp/q5_${name}.b${attempt}.log" 2>&1 \
      && { note "$name ok (b$attempt)"; return 0; }
    note "$name rc=$? (b$attempt)"
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
  done
  return 1
}

CURVE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --fused-trials --bf16 --resume"
K18="$CURVE --system heisenberg_kagome_18 --output experiments/heisenberg_kagome_18.csv --pin-noise-floor --restarts auto"
TAIL="--number-sweeps 25600,51200 --repetitions 1024 --trials 2"
DEEP="--number-sweeps 102400,204800 --repetitions 256 --trials 4"

# --- 1. bench capture first: banks the headline + slab numbers ----------
BENCH_NO_PREEMPT=1 ASP_BENCH_BUDGET_S=2400 stage bench 3600 python bench.py

# --- 2. kagome-18 at full statistics (replaces the r4 128x2 CPU curve) --
stage k18_head 10800 $K18 \
  --number-sweeps 100,200,400,800,1600,3200,6400,12800 \
  --repetitions 1024 --trials 10

# --- 3. sk_32_1 sector ED: bounded dedicated window (checkpointed) ------
stage sk32_ed 14400 python scripts/sk32_ed.py

# --- 4. kagome-36 NN self-training at the reference config --------------
#     (train.py:1612-1675: dense 8x64, SGD 2e-2 momentum 0.8, batch 128,
#      100k samples, 2 outer iterations)
stage k36_train 10800 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing --number-samples 100000 \
  --model dense --learning-rate 2e-2 --momentum 0.8 --batch-size 128 \
  --metrics-subsample 1000000 --number-outer-iterations 2 --seed 540041 \
  --output experiments/kagome_train_r5

# --- 5. kagome-18 tails ---------------------------------------------------
stage k18_tail 7200 $K18 $TAIL
stage k18_deep 10800 $K18 $DEEP

# --- 6. order-2 SA cluster cell on the slab engine (design workload) ----
stage k36_sa_o2 7200 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_kagome_36 --order 2 --seed 991050 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome_sa_o2.csv.r5 \
  --noise 0 --global-cutoff 1e-06 --number-samples 12 \
  --max-cluster-size 400 --number-sweeps 5000 --repetitions 64 --resume

# --- 7. the other five curves: mids, tails, deeps ------------------------
stage j1j2_mid 5400 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv \
  --number-sweeps 1600,3200,6400,12800 --repetitions 1024 --trials 10
stage sk3_mid 7200 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv \
  --number-sweeps 800,1600,3200,6400,12800 --repetitions 1024 --trials 10
stage sk1_mid 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv \
  --number-sweeps 6400,12800 --repetitions 1024 --trials 10
stage sk2_mid 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv \
  --number-sweeps 6400,12800 --repetitions 1024 --trials 10
stage j1j2_tail 5400 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv $TAIL
stage sk1_tail 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $TAIL
stage sk2_tail 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv $TAIL
stage sk3_tail 5400 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $TAIL
stage k16_deep 9000 $CURVE --system heisenberg_kagome_16 \
  --output experiments/heisenberg_kagome_16.csv $DEEP
stage j1j2_deep 9000 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv $DEEP
stage sk1_deep 9000 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $DEEP
stage sk2_deep 9000 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv $DEEP
stage sk3_deep 9000 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $DEEP

# --- 8. NQS pyrochlore-32 amplitude pretrain at scale --------------------
stage nqs_pyro 10800 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 200 --seed 540050

# --- 9. any remaining time: sk_32 ED continuation ------------------------
left=$(( END_TS - $(date +%s) ))
if [ "$left" -gt 1800 ]; then
  [ "$left" -gt 10800 ] && left=10800
  stage sk32_ed2 "$left" python scripts/sk32_ed.py
fi
note "queue r5 complete"
rm -f /tmp/queue_r5.pid
