#!/bin/bash
# Round-5 queue, phase C (supersedes queue_r5b.sh's remainder while its
# k18_head2 stage is still in flight). Change vs phase B: the committed
# single-chain k18 TPU rows show the expected mid-curve dip vs the
# reference (400: 0.882 vs 0.936; 800 trending the same way — exactly
# what the r4 restart-splitting study predicted), so a separately-
# labelled restart-split variant curve (same flip budget, n=min(8,T//100)
# chains, own CSV; rendered as its own COMPARISON table) is inserted
# right after the decisive sk_16_1/2 cells.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
echo $$ > /tmp/queue_r5c.pid
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_r5.log; }
note "queue r5c started (pid $$)"

END_TS=$(date -d '2026-08-19 07:45' +%s)
HARD_END=$(date -d '2026-08-19 08:15' +%s)

# wait for the in-flight k18_head2 stage (phase B) to release the TPU
K18_PID="${K18_PID:-4696}"
while kill -0 "$K18_PID" 2>/dev/null; do sleep 30; done
note "k18_head2 process $K18_PID gone; phase C begins"

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
K18BASE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --bf16 --resume --system heisenberg_kagome_18 --pin-noise-floor"
A="--repetitions 1024 --trials 4"
B="--number-sweeps 102400,204800 --repetitions 256 --trials 4"

# finish any k18 head points the phase-B stage didn't land (resume
# skips completed sweep counts, so this is cheap when all 7 are in)
K18_ROWS=$(grep -vc '^#' experiments/heisenberg_kagome_18.csv 2>/dev/null || echo 0)
if [ "$K18_ROWS" -lt 7 ]; then
  stage k18_fin 7200 $K18BASE --restarts 1 \
    --output experiments/heisenberg_kagome_18.csv \
    --number-sweeps 100,200,400,800,1600,3200,6400 $A
fi

# --- the decisive cells: sk_16_1 / sk_16_2 full schedule -----------------
stage sk1_a 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv \
  --number-sweeps 6400,12800,25600,51200 $A
stage sk1_b 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $B
stage sk2_a 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv \
  --number-sweeps 6400,12800,25600,51200 $A
stage sk2_b 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv $B

# --- kagome-18 restart-split variant (the r4 study, at full stats) -------
stage k18_restarts 7200 $K18BASE --restarts auto \
  --output experiments/heisenberg_kagome_18_restarts.csv \
  --number-sweeps 200,400,800,1600,3200 $A

# --- sk_16_3 (reference reaches 1.0; show where we reach it) -------------
stage sk3_a 7200 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv \
  --number-sweeps 800,1600,3200,6400,12800,25600,51200 $A
stage sk3_b 5400 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $B

# --- confirmation cells: j1j2 + kagome-16 deep ---------------------------
stage j1j2_a 7200 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv \
  --number-sweeps 1600,3200,6400,12800,25600,51200 $A
stage k16_b 5400 $CURVE --system heisenberg_kagome_16 \
  --output experiments/heisenberg_kagome_16.csv $B
stage j1j2_b 5400 $CURVE --system j1j2_square_4x4 \
  --output experiments/j1j2_square_4x4.csv $B

# --- kagome-18 tail (slab engine; only if the window allows) -------------
stage k18_tail 7200 $K18BASE --restarts 1 \
  --output experiments/heisenberg_kagome_18.csv \
  --number-sweeps 12800,25600 --repetitions 1024 --trials 2

# --- sk_32_1 sector ED: bounded window (checkpointed restarts) -----------
stage sk32_ed 7200 python scripts/sk32_ed.py

# --- kagome-36 NN self-training at the reference config ------------------
stage k36_train 10800 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing --number-samples 100000 \
  --model dense --learning-rate 2e-2 --momentum 0.8 --batch-size 128 \
  --metrics-subsample 1000000 --number-outer-iterations 2 --seed 540041 \
  --output experiments/kagome_train_r5

note "queue r5c complete"
rm -f /tmp/queue_r5c.pid
