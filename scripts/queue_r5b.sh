#!/bin/bash
# Round-5 queue, phase B (replaces queue_r5.sh's remainder once
# k18_head finishes). Re-prioritised mid-round: the 16-spin systems run
# on the dense MXU engine (~2e9 flips/s), so completing the reference's
# FULL 12-point sweep schedule (Makefile:33-34, up to 204800) for every
# small system costs ~45-60 min/stage — and sk_16_1 / sk_16_2 deep
# cells are the only places the reference's published headline rows
# (0.577 / 0.838 @ 204800) still outrank our last measured rows. Those
# land first; sk_32_1 sector ED and the kagome-36 100k NN loop take
# whatever window remains (both checkpoint/resume, so a deadline cut
# still banks progress).
#
# Hygiene identical to queue_r5.sh: one pidfile, direct timeout
# children, END_TS gate per stage, nothing outlives HARD_END.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
echo $$ > /tmp/queue_r5b.pid
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_r5.log; }
note "queue r5b started (pid $$)"

END_TS=$(date -d '2026-08-19 07:45' +%s)
HARD_END=$(date -d '2026-08-19 08:15' +%s)

# wait for the in-flight k18_head stage (launched by queue_r5.sh) to
# release the TPU — the relay tolerates exactly one client
K18_PID="${K18_PID:-2999}"
while kill -0 "$K18_PID" 2>/dev/null; do sleep 30; done
note "k18_head process $K18_PID gone; phase B begins"

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

# fused trials stay ON for the 16-spin systems (12870-state programs,
# where fusing amortises dispatch overhead) but k18 runs UNFUSED with
# single-chain replicas: at K=48620 the fused R=10240 slab program spent
# 50+ min in trace/compile without landing a row, and restarts=1 makes
# the flagship curve protocol-identical to the reference (1024 replicas
# x 10 trials, single chain) — the restart-splitting study stays a
# separate committed result rather than a headline-curve deviation.
CURVE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --fused-trials --bf16 --resume"
K18="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --bf16 --resume --system heisenberg_kagome_18 --output experiments/heisenberg_kagome_18.csv --pin-noise-floor --restarts 1"
# A = remaining 1024-replica rows; B = the 102400/204800 deep rows
A="--repetitions 1024 --trials 4"
B="--number-sweeps 102400,204800 --repetitions 256 --trials 4"

# flagship curve at full replica statistics (1024 x 4, single chain,
# unfused: one compile per point, ten-ish minutes each on the relay;
# the 12800+ rows ride a later tail stage so the sk cells aren't
# starved if the slab engine runs slower than projected)
stage k18_head2 10800 $K18 \
  --number-sweeps 100,200,400,800,1600,3200,6400 \
  --repetitions 1024 --trials 4

# --- the decisive cells: sk_16_1 / sk_16_2 full schedule -----------------
stage sk1_a 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv \
  --number-sweeps 6400,12800,25600,51200 $A
stage sk1_b 5400 $CURVE --system sk_16_1 --output experiments/sk_16_1.csv $B
stage sk2_a 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv \
  --number-sweeps 6400,12800,25600,51200 $A
stage sk2_b 5400 $CURVE --system sk_16_2 --output experiments/sk_16_2.csv $B

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
stage k18_tail 7200 $K18 --number-sweeps 12800,25600 --repetitions 1024 --trials 2

# --- sk_32_1 sector ED: bounded window (checkpointed restarts) -----------
stage sk32_ed 7200 python scripts/sk32_ed.py

# --- kagome-36 NN self-training at the reference config ------------------
stage k36_train 10800 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing --number-samples 100000 \
  --model dense --learning-rate 2e-2 --momentum 0.8 --batch-size 128 \
  --metrics-subsample 1000000 --number-outer-iterations 2 --seed 540041 \
  --output experiments/kagome_train_r5

# --- remaining time: sk_32 ED continuation --------------------------------
left=$(( END_TS - $(date +%s) ))
if [ "$left" -gt 1800 ]; then
  [ "$left" -gt 10800 ] && left=10800
  stage sk32_ed2 "$left" python scripts/sk32_ed.py
fi
note "queue r5b complete"
rm -f /tmp/queue_r5b.pid
