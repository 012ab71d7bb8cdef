#!/bin/bash
# Round-4 TPU queue. Addresses VERDICT round-3 "Next round" items in
# priority order:
#   1. kagome-18 curve, full 12 points, linear-informative schedule
#   2. slab + dense bench capture (bench.py as a stage, no self-preempt)
#   3. finish the small-system curves to 204800 sweeps
#   5. cluster statistics: first pyrochlore rows, kagome noise cell,
#      one SA-annealed cell, kagome-36 volume
#   6. kagome-36 NN self-training loop
#   7. pyrochlore-32 NQS baseline
#   4. sk_32_1 checkpointed Lanczos restarts (tail; bounded)
#
# Hygiene (VERDICT weak #7): ONE pidfile (/tmp/queue_r4.pid) holding this
# orchestrator's PID; every stage is a direct `timeout` child, so
# bench.py's recorded-PID kill tree reaps everything; a hard END_TS stops
# new stages well before the session closes, and each stage probes the
# relay (UNAVAILABLE self-recovers in 15-20 min) instead of dying on rc=1.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
echo $$ > /tmp/queue_r4.pid
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_r4.log; }
note "queue r4 started (pid $$)"

# no NEW stage after this; stage timeouts keep everything dead by ~10:40
END_TS=$(date -d '2026-08-18 09:50' +%s)

probe_backend() {
  # wait out relay outages (they self-recover in 15-20 min, occasionally
  # longer): keep probing until the round deadline rather than burning
  # through the stage list while the backend is down
  until timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; do
    note "backend probe failed; retrying in 120s"
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
    sleep 120
  done
  return 0
}

stage() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  if [ "$(date +%s)" -ge "$END_TS" ]; then note "deadline; skip $name"; return 1; fi
  for attempt in 1 2; do
    probe_backend || { note "$name: no backend; giving up"; return 1; }
    timeout "$to" "$@" > "/tmp/q4_${name}.a${attempt}.log" 2>&1 \
      && { note "$name ok (a$attempt)"; return 0; }
    note "$name rc=$? (a$attempt)"
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
  done
  return 1
}

CURVE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --fused-trials --bf16 --resume"

# --- 1. kagome-18: the round's headline claim --------------------------
stage k18_head 10800 $CURVE --system heisenberg_kagome_18 \
  --output experiments/heisenberg_kagome_18.csv --pin-noise-floor \
  --number-sweeps 100,200,400,800,1600,3200,6400,12800 \
  --repetitions 1024 --trials 10

# --- 2. bench capture early (fresh number banked even if the relay dies
#     later; BENCH_NO_PREEMPT so it does not kill this orchestrator) ----
BENCH_NO_PREEMPT=1 stage bench 3600 python bench.py

# --- 3a. mid-points at full statistics (1024 x 10) ---------------------
stage sk3_mid 7200 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv \
  --number-sweeps 800,1600,3200,6400,12800 --repetitions 1024 --trials 10
stage sk1_mid 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv \
  --number-sweeps 6400,12800 --repetitions 1024 --trials 10
stage sk2_mid 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv \
  --number-sweeps 6400,12800 --repetitions 1024 --trials 10
stage j1j2_mid 5400 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv \
  --number-sweeps 1600,3200,6400,12800 --repetitions 1024 --trials 10

# --- 1b. kagome-18 tail (reference is 1.0 here; 2048 chains/point) -----
stage k18_tail1 7200 $CURVE --system heisenberg_kagome_18 \
  --output experiments/heisenberg_kagome_18.csv --pin-noise-floor \
  --number-sweeps 25600,51200 --repetitions 1024 --trials 2

# --- 5a. first pyrochlore cluster rows + kagome noise + SA cells -------
CL="python -m annealing_sign_problem_tpu.experiments.sampled_connected_components --order 2 --resume"
stage pyro_cl1 7200 $CL --system heisenberg_pyrochlore_2x2x2 --seed 540010 \
  --output experiments/pyrochlore/noise_0/cutoff_2e-06/pyrochlore.csv.r4a \
  --noise 0 --no-annealing --global-cutoff 2e-06 --number-samples 40
stage kagome_noise 7200 $CL --system heisenberg_kagome_36 --seed 540020 \
  --output experiments/kagome/noise_2e-1/cutoff_1e-06/kagome_noise.csv.r4a \
  --noise 2e-1 --no-annealing --global-cutoff 1e-06 --number-samples 40
stage kagome_sa 9000 $CL --system heisenberg_kagome_36 --seed 540030 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome_sa.csv.r4a \
  --noise 0 --global-cutoff 1e-06 --number-samples 25

# --- 3b. curve tails to 204800 ------------------------------------------
TAIL="--number-sweeps 25600,51200 --repetitions 1024 --trials 2"
DEEP="--number-sweeps 102400,204800 --repetitions 256 --trials 4"
stage sk1_tail 7200 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $TAIL
stage sk1_deep 9000 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $DEEP
stage sk2_tail 7200 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv $TAIL
stage sk2_deep 9000 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv $DEEP
stage sk3_tail 7200 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $TAIL
stage sk3_deep 9000 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $DEEP
stage j1j2_tail 7200 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv $TAIL
stage j1j2_deep 9000 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv $DEEP
stage k16_deep 9000 $CURVE --system heisenberg_kagome_16 \
  --output experiments/heisenberg_kagome_16.csv $DEEP

# --- 1c. kagome-18 deep tail --------------------------------------------
stage k18_deep 12000 $CURVE --system heisenberg_kagome_18 \
  --output experiments/heisenberg_kagome_18.csv --pin-noise-floor $DEEP

# --- 6. kagome-36 NN self-training loop ---------------------------------
stage k36_train 10800 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing --number-samples 100000 \
  --number-outer-iterations 2 --seed 540040 --output experiments/kagome_train_r4

# --- 7. pyrochlore-32 NQS baseline (prints mean,err,exact to the stage
#     log; banked into RESULTS.md after the run) --------------------------
stage nqs_pyro 10800 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 200 --seed 540050

# --- 5b. cluster volume (kagome-36 toward Figure-6 scale) ---------------
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
  stage sk32_ed "$left" python scripts/sk32_ed.py
fi
note "queue r4 complete"
rm -f /tmp/queue_r4.pid
