#!/bin/bash
# Round-4 TPU queue, take 2 (v4b). Supersedes queue_r4.sh: the relay was
# down for the first ~1.5h of the round, so stages are strictly ordered by
# VERDICT round-3 priority (missing #1 kagome-18 curve, then bench, then
# missing #2 curve tails, then missing #3/#5/#6 pyrochlore rows + NN loop +
# NQS, then the extra cluster cells, then the sk_32 ED tail), and the
# heavyweight cluster cells carry bounded budgets (--resume makes every
# stage interruptible/continuable).
#
# Hygiene: ONE pidfile (/tmp/queue_r4b.pid) holding this orchestrator's
# PID; every stage is a direct `timeout` child so bench.py's recorded-PID
# kill tree reaps everything; stages never START within 15 min of HARD_END
# and their timeouts are clipped so nothing outlives HARD_END.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
echo $$ > /tmp/queue_r4b.pid
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_r4b.log; }
note "queue r4b started (pid $$)"

# no NEW stage after END_TS; nothing may run past HARD_END (driver bench
# lands after the session; the TPU must be quiet well before that)
END_TS=$(date -d '2026-08-18 10:30' +%s)
HARD_END=$(date -d '2026-08-18 11:30' +%s)

probe_backend() {
  until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    note "backend probe failed; retrying in 120s"
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
    sleep 120
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
    timeout "$to" "$@" > "/tmp/q4_${name}.b${attempt}.log" 2>&1 \
      && { note "$name ok (b$attempt)"; return 0; }
    note "$name rc=$? (b$attempt)"
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
  done
  return 1
}

CURVE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --fused-trials --bf16 --resume"
K18="$CURVE --system heisenberg_kagome_18 --output experiments/heisenberg_kagome_18.csv --pin-noise-floor"
TAIL="--number-sweeps 25600,51200 --repetitions 1024 --trials 2"
DEEP="--number-sweeps 102400,204800 --repetitions 256 --trials 4"

# --- 1. kagome-18: the round's headline claim, full 12 points -----------
stage k18_head 10800 $K18 \
  --number-sweeps 100,200,400,800,1600,3200,6400,12800 \
  --repetitions 1024 --trials 10

# --- 2. bench capture early (fresh number banked even if the relay dies
#     later; BENCH_NO_PREEMPT so it does not kill this orchestrator) ----
BENCH_NO_PREEMPT=1 stage bench 3600 python bench.py

stage k18_tail 7200 $K18 $TAIL
stage k18_deep 10800 $K18 $DEEP

# --- 3. the other five curves: mid points at full statistics, then tails
stage sk3_mid 7200 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv \
  --number-sweeps 800,1600,3200,6400,12800 --repetitions 1024 --trials 10
stage j1j2_mid 5400 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv \
  --number-sweeps 1600,3200,6400,12800 --repetitions 1024 --trials 10
stage sk1_mid 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv \
  --number-sweeps 6400,12800 --repetitions 1024 --trials 10
stage sk2_mid 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv \
  --number-sweeps 6400,12800 --repetitions 1024 --trials 10
stage sk1_tail 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $TAIL
stage sk2_tail 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv $TAIL
stage sk3_tail 5400 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $TAIL
stage j1j2_tail 5400 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv $TAIL
stage k16_deep 9000 $CURVE --system heisenberg_kagome_16 \
  --output experiments/heisenberg_kagome_16.csv $DEEP
stage sk1_deep 9000 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $DEEP
stage sk2_deep 9000 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv $DEEP
stage sk3_deep 9000 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $DEEP
stage j1j2_deep 9000 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv $DEEP

# --- 5a. first nonzero pyrochlore cluster rows ---------------------------
CL="python -m annealing_sign_problem_tpu.experiments.sampled_connected_components --order 2 --resume"
stage pyro_cl1 7200 $CL --system heisenberg_pyrochlore_2x2x2 --seed 540010 \
  --output experiments/pyrochlore/noise_0/cutoff_2e-06/pyrochlore.csv.r4a \
  --noise 0 --no-annealing --global-cutoff 2e-06 --number-samples 24

# --- 6. kagome-36 NN self-training loop (resumable across retries) ------
stage k36_train 10800 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing --number-samples 100000 \
  --number-outer-iterations 2 --seed 540040 --output experiments/kagome_train_r4

# --- 7. pyrochlore-32 NQS baseline ---------------------------------------
stage nqs_pyro 10800 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 200 --seed 540050

# --- 5b. kagome noise cell + one SA-annealed cell (bounded budgets) ------
stage kagome_noise 7200 $CL --system heisenberg_kagome_36 --seed 540020 \
  --output experiments/kagome/noise_2e-1/cutoff_1e-06/kagome_noise.csv.r4a \
  --noise 2e-1 --no-annealing --global-cutoff 1e-06 --number-samples 24
stage kagome_sa 7200 $CL --system heisenberg_kagome_36 --seed 540030 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome_sa.csv.r4a \
  --noise 0 --global-cutoff 1e-06 --number-samples 12 \
  --max-cluster-size 400 --number-sweeps 1500 --repetitions 32

# --- 5c. cluster volume --------------------------------------------------
stage kagome_vol1 7200 $CL --system heisenberg_kagome_36 --seed 540060 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome.csv.r4b \
  --noise 0 --no-annealing --global-cutoff 1e-06 --number-samples 60
stage pyro_cl2 7200 $CL --system heisenberg_pyrochlore_2x2x2 --seed 540070 \
  --output experiments/pyrochlore/noise_0/cutoff_2e-06/pyrochlore.csv.r4b \
  --noise 0 --no-annealing --global-cutoff 2e-06 --number-samples 40
stage kagome_vol2 7200 $CL --system heisenberg_kagome_36 --seed 540080 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome.csv.r4c \
  --noise 0 --no-annealing --global-cutoff 1e-06 --number-samples 60

# --- 4. sk_32_1 checkpointed Lanczos restarts (bounded tail) ------------
left=$(( END_TS - $(date +%s) ))
if [ "$left" -gt 1800 ]; then
  [ "$left" -gt 5400 ] && left=5400
  stage sk32_ed "$left" python scripts/sk32_ed.py
fi
note "queue r4b complete"
rm -f /tmp/queue_r4b.pid
