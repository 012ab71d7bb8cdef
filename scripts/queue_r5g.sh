#!/bin/bash
# Round-5 queue, phase G — phase F plus the kagome-18 tail points that
# phase D planned and E/F dropped: kagome-18 is the one cell where the
# reference's P(acc) column wins mid-curve (0.9954 vs 1.0 at 6400), and
# its headline is a last-row (204800) value; rows at 12800/25600 show
# where our single-chain curve reaches 1.0. Inserted after the
# reference-config training run and the slab SA cell (VERDICT items 4/5
# outrank a tie-confirmation). Stage list otherwise identical to F; all
# stages --resume.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
echo $$ > /tmp/queue_r5d.pid
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_r5.log; }
note "queue r5g started (pid $$)"

WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  note "predecessor stage pid $WAIT_PID exited"
fi

END_TS=$(date -d '2026-08-19 12:00' +%s)
HARD_END=$(date -d '2026-08-19 12:30' +%s)

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
    [ "$left" -lt 600 ] && { note "hard end near; skip $name"; return 1; }
    [ "$to" -gt "$left" ] && to=$left
    timeout "$to" "$@" > "/tmp/q5_${name}.g${attempt}.log" 2>&1 \
      && { note "$name ok (g$attempt)"; return 0; }
    note "$name rc=$? (g$attempt)"
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
  done
  return 1
}

CURVE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --fused-trials --bf16 --resume"
K18BASE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --bf16 --resume --system heisenberg_kagome_18 --pin-noise-floor"
A="--repetitions 1024 --trials 4"
B="--number-sweeps 102400,204800 --repetitions 256 --trials 4"

# finish sk_16_3 curve if the orphaned stage was cut (resume = free)
stage sk3_a 4800 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv \
  --number-sweeps 800,1600,3200,6400,12800,25600,51200 $A

# sk_16_1 headline points
stage sk1_b 3600 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $B

# kagome-18 restart-split variant over the losing mid-curve window
stage k18_restarts 4800 $K18BASE --restarts auto \
  --output experiments/heisenberg_kagome_18_restarts.csv \
  --number-sweeps 400,800,1600,3200 $A

# kagome-36 NN self-training at the reference config
stage k36_train 7200 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing --number-samples 100000 \
  --model dense --learning-rate 2e-2 --momentum 0.8 --batch-size 128 \
  --metrics-subsample 1000000 --number-outer-iterations 2 --seed 540041 \
  --output experiments/kagome_train_r5

# order-2 SA cluster cell on the slab engine (design workload)
stage sa_o2 3600 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_kagome_36 --order 2 --seed 995060 --noise 0 \
  --global-cutoff 1e-06 --number-sweeps 5000 --repetitions 64 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome_sa_o2.csv.r5tpu \
  --number-samples 8 --resume

# kagome-18 single-chain tail: where does the curve reach 1.0?
stage k18_tail 5400 $K18BASE --restarts 1 \
  --output experiments/heisenberg_kagome_18.csv \
  --number-sweeps 12800,25600 --repetitions 1024 --trials 2

# sk_16_3 headline points
stage sk3_b 3600 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $B

# pure confirmations (both systems already beat the reference headline)
stage j1j2_a 5400 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv \
  --number-sweeps 1600,3200,6400,12800,25600,51200 $A
stage k16_b 4200 $CURVE --system heisenberg_kagome_16 \
  --output experiments/heisenberg_kagome_16.csv $B
stage j1j2_b 4200 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv $B

# bounded sk_32_1 sector-ED demonstration (full convergence needs 13-20h;
# a checkpointed partial run proves the 601M-state machinery at scale)
stage sk32_demo 5400 python scripts/sk32_ed.py

note "queue r5g complete"
rm -f /tmp/queue_r5d.pid
