#!/bin/bash
# Round-5 queue, phase H (v2) — remaining stages in the judge's own
# priority order (VERDICT "What's missing" / "Next round"):
#   1. sk32_demo  — sk_32_1 sector ED in a dedicated window (missing #1).
#                   Full convergence projects 13-20 h, so the stage is
#                   SELF-BOUNDED: inner timeout 4500 s, rc=124 treated as
#                   success — per-restart checkpoints under .cache/ are
#                   the deliverable (plus the measured 601M-state matvec
#                   rate); no misleading unconverged .h5 is written.
#   2. k36_train  — reference-config kagome-36 self-training (next-round #4)
#   3. sa_o2      — order-2 SA cluster cell on the slab engine (#5)
#   4. k18_tail   — kagome-18 single-chain tail: reaches 1.0 at 1/8 the
#                   reference's sweeps (curve-tails item #3)
#   5. nqs_pyro   — pyrochlore-32 amplitude pretrain at 10x steps (#8)
#   6. sk3_b      — sk_16_3 204800 confirmation rows (already 1.0 at 25600)
# The in-flight k18_restarts stage (phase G, pid $1) finishes first.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
echo $$ > /tmp/queue_r5d.pid
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_r5.log; }
note "queue r5h started (pid $$)"

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
    timeout "$to" "$@" > "/tmp/q5_${name}.h${attempt}.log" 2>&1 \
      && { note "$name ok (h$attempt)"; return 0; }
    note "$name rc=$? (h$attempt)"
    [ "$(date +%s)" -ge "$END_TS" ] && return 1
  done
  return 1
}

CURVE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --fused-trials --bf16 --resume"
K18BASE="python -m annealing_sign_problem_tpu.experiments.full_hilbert_space --seed 435834 --bf16 --resume --system heisenberg_kagome_18 --pin-noise-floor"
B="--number-sweeps 102400,204800 --repetitions 256 --trials 4"

# 1. bounded sk_32_1 sector-ED window (checkpoint accumulates restarts)
stage sk32_demo 5100 bash -c \
  'timeout 4500 python scripts/sk32_ed.py 4 40; rc=$?; [ $rc -eq 124 ] && exit 0; exit $rc'

# 2. kagome-36 NN self-training at the reference config
stage k36_train 7200 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing --number-samples 100000 \
  --model dense --learning-rate 2e-2 --momentum 0.8 --batch-size 128 \
  --metrics-subsample 1000000 --number-outer-iterations 2 --seed 540041 \
  --output experiments/kagome_train_r5

# 3. order-2 SA cluster cell on the slab engine (design workload)
stage sa_o2 3600 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_kagome_36 --order 2 --seed 995060 --noise 0 \
  --global-cutoff 1e-06 --number-sweeps 5000 --repetitions 64 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome_sa_o2.csv.r5tpu \
  --number-samples 8 --resume

# 4. kagome-18 single-chain tail: where does the curve reach 1.0?
stage k18_tail 5400 $K18BASE --restarts 1 \
  --output experiments/heisenberg_kagome_18.csv \
  --number-sweeps 12800,25600 --repetitions 1024 --trials 2

# 5. pyrochlore-32 amplitude pretrain at 10x steps (VERDICT missing #5)
stage nqs_pyro 7200 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 96 \
  --pretrain-steps 20000 --seed 540050

# 6. sk_16_3 headline confirmation rows
stage sk3_b 3600 $CURVE --system sk_16_3 --output experiments/sk_16_3.csv $B

note "queue r5h complete"
rm -f /tmp/queue_r5d.pid
