#!/bin/bash
# Round-3 session-7 queue, v14: takes over from v13 at the stage-5
# boundary (after "sk32 probe rc=" lands in /tmp/queue_v13.log), i.e.
# BEFORE v13's curve-extension tail. Rationale: with the fair curves
# committed through 12800-51200 sweeps, extra sweep-count tail points
# are worth less TPU time than (a) cluster statistics volume toward the
# Figure-6-8 scale (VERDICT round 2, missing item 3) and (b) banking
# checkpointed sk_32_1 Lanczos restarts (missing item 2 — the full ED
# projects 10h+ at the probed matvec rate, so this session contributes
# resumable progress, not completion).
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_v14.log; }
note "v14 armed, waiting for v13 stage-5 boundary"

V13PID=$(cat /tmp/queue_v13.pid 2>/dev/null)
# deadlines (epoch seconds): after SOFT, take over at the next v13 stage
# boundary (a new note line) instead of waiting for the probe; after
# HARD, take over unconditionally so the curve/cluster stages get TPU
# time before the session closes.
SOFT=$(date -d '2026-08-18 02:00' +%s)
HARD=$(date -d '2026-08-18 03:30' +%s)
NOTES_AT_SOFT=""
while kill -0 "$V13PID" 2>/dev/null; do
  NOW=$(date +%s)
  if [ "$NOW" -ge "$SOFT" ] && [ -z "$NOTES_AT_SOFT" ]; then
    NOTES_AT_SOFT=$(wc -l < /tmp/queue_v13.log 2>/dev/null || echo 0)
    note "soft deadline reached; will take over at the next stage boundary"
  fi
  BOUNDARY=""
  if grep -q "sk32 probe rc=" /tmp/queue_v13.log 2>/dev/null; then
    BOUNDARY=probe
  elif [ "$NOW" -ge "$HARD" ]; then
    BOUNDARY=hard-deadline
  elif [ -n "$NOTES_AT_SOFT" ] \
      && [ "$(wc -l < /tmp/queue_v13.log 2>/dev/null || echo 0)" -gt "$NOTES_AT_SOFT" ]; then
    BOUNDARY=soft-deadline-stage-end
  fi
  if [ -n "$BOUNDARY" ]; then
    note "takeover trigger: $BOUNDARY"
    # stage boundary reached: stop v13's orchestrator and its direct
    # children (recorded PIDs only, never name patterns)
    for kid in $(cat "/proc/$V13PID/task/$V13PID/children" 2>/dev/null); do
      for gkid in $(cat "/proc/$kid/task/$kid/children" 2>/dev/null); do
        kill "$gkid" 2>/dev/null
      done
      kill "$kid" 2>/dev/null
    done
    kill "$V13PID" 2>/dev/null
    note "v13 stopped at stage-5 boundary (pid $V13PID)"
    sleep 45  # let the relay drop the old session
    break
  fi
  sleep 30
done
kill -0 "$V13PID" 2>/dev/null || note "v13 gone; proceeding"
sleep 5

clusters() { # system, outdir, cutoff, seed, tag, nsamples, timeout, noise
  local s=$1 dir=$2 cut=$3 seed=$4 tag=$5 n=$6 to=$7 noise=${8:-0}
  for attempt in 1 2; do
    timeout "$to" python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
      --system "$s" --seed "$seed" \
      --output "experiments/$dir/noise_$noise/cutoff_$cut/$tag.a$attempt" \
      --order 2 --noise "$noise" --no-annealing --global-cutoff "$cut" \
      --number-samples "$n" > "/tmp/q14_cl_$tag.a$attempt.log" 2>&1 \
      && { note "clusters $tag.a$attempt ok"; return; }
    note "clusters $tag.a$attempt rc=$?"
    seed=$((seed + 1000))
  done
}

# 0. ten-minute slab-engine capture at the kagome-36 cluster shape
#    (VERDICT item 3's target: >= 1e9 flips/s at K ~ 3e4) — de-risks the
#    round-end bench.py number
timeout 1800 python scripts/slab_bench.py > /tmp/q14_slab_bench.log 2>&1
note "slab bench rc=$?"

curve() { # system, schedule, timeout, extra args...
  local s=$1 sched=$2 to=$3; shift 3
  timeout "$to" python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
    --system "$s" --seed 435834 --output "experiments/$s.csv" \
    --number-sweeps "$sched" \
    --repetitions 1024 --trials 10 --fused-trials --bf16 --resume "$@" \
    >> "/tmp/q14_curve_$s.log" 2>&1 && { note "curve $s ($sched) ok"; return; }
  note "curve $s ($sched) rc=$?"
}

# 1. complete the truncated fair curves through 12800 (sk_16_3 stops at
#    400, j1j2 at 800, sk_16_1/2 at 3200 — --resume skips done points)
curve sk_16_3 100,200,400,800,1600,3200,6400,12800 4200
curve sk_16_1 100,200,400,800,1600,3200,6400,12800 4200
curve sk_16_2 100,200,400,800,1600,3200,6400,12800 4200
curve j1j2_square_4x4 100,200,400,800,1600,3200,6400,12800 4200

# 2. v13's stage-6 work (it never reached it): first pyrochlore CSV,
#    kagome volume, one noise cell
clusters heisenberg_pyrochlore_2x2x2 pyrochlore 2e-06 530030 pyrochlore.csv.s3a 40 5400
clusters heisenberg_kagome_36 kagome 1e-06 530020 kagome.csv.s3c 50 5400
clusters heisenberg_kagome_36 kagome 1e-06 530060 kagome_noise.csv.s3n 40 5400 2e-1

# 3. kagome-36 volume toward the Figure-6 scale
clusters heisenberg_kagome_36 kagome 1e-06 530040 kagome.csv.s3d 60 5400
clusters heisenberg_kagome_36 kagome 1e-06 530050 kagome.csv.s3e 60 5400
clusters heisenberg_kagome_36 kagome 1e-06 530070 kagome.csv.s3f 60 5400
clusters heisenberg_pyrochlore_2x2x2 pyrochlore 2e-06 530080 pyrochlore.csv.s3b 40 5400

# 4. curve tails to 51200 (opportunistic)
curve sk_16_1 25600,51200 5400
curve sk_16_2 25600,51200 5400
curve sk_16_3 25600,51200 5400
curve j1j2_square_4x4 25600,51200 5400

# 5. tail: bank checkpointed sk_32_1 Lanczos restarts until the session
#    window closes (per-restart checkpoints under /root/sk32_ckpt; a
#    later round resumes). Bounded, not expected to converge here.
timeout 14400 python scripts/sk32_ed.py > /tmp/q14_sk32_ed.log 2>&1
note "sk32 ED tail rc=$?"
note "v14 queue complete"
