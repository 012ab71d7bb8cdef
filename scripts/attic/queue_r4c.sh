#!/bin/bash
# Round-4 TPU queue, take 3 (r4c). Supersedes queue_r4b.sh: the relay was
# down 01:15-03:00+, and the CPU cluster workers (scripts/pyro_cpu_clusters.py,
# scripts/k36_cpu_clusters.py) now cover every --no-annealing/SA cluster
# cell host-side, so the TPU hours that remain go strictly to work only
# the TPU can do, in VERDICT priority order: kagome-18 curve (missing #1),
# bench (weak #1), k18 tails, NN self-training (missing #5), NQS baseline
# (missing #6), then the small-system curve completions (missing #2), and
# the sk_32 ED checkpointed tail (missing #4).
#
# Hygiene: ONE pidfile (/tmp/queue_r4c.pid) holding this orchestrator's
# PID; every stage is a direct `timeout` child so bench.py's recorded-PID
# kill tree reaps everything; stages never START within 15 min of HARD_END
# and their timeouts are clipped so nothing outlives HARD_END.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
echo $$ > /tmp/queue_r4c.pid
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_r4c.log; }
note "queue r4c started (pid $$)"

# no NEW stage after END_TS; nothing may run past HARD_END (driver bench
# lands after the session; the TPU must be quiet well before that)
END_TS=$(date -d '2026-08-18 10:30' +%s)
HARD_END=$(date -d '2026-08-18 11:30' +%s)

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

# --- 3. kagome-36 NN self-training loop (resumable across retries) ------
stage k36_train 10800 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing --number-samples 100000 \
  --number-outer-iterations 2 --seed 540040 --output experiments/kagome_train_r4

# --- 4. pyrochlore-32 NQS baseline ---------------------------------------
stage nqs_pyro 10800 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 200 --seed 540050

# --- 5. the other five curves: mid points at full statistics, then tails
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

# --- 6. sk_32_1 checkpointed Lanczos restarts (bounded tail) ------------
left=$(( END_TS - $(date +%s) ))
if [ "$left" -gt 1800 ]; then
  [ "$left" -gt 5400 ] && left=5400
  stage sk32_ed "$left" python scripts/sk32_ed.py
fi
note "queue r4c complete"
rm -f /tmp/queue_r4c.pid
