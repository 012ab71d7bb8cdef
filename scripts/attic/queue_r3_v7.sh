#!/bin/bash
# Round-3 session-3 queue, v7 (supersedes v6: kagome-18 curve runs with --pin-noise-floor, see RESULTS.md kagome-18 story): the fairness fix first —
# the committed sk_16_* / j1j2 curves are still the round-2 single-trial
# oracle-x0 files (VERDICT weakness #1) — staged via --resume so every
# system banks fair points early; certification + cluster volume up
# front; NN loop / NQS / tails opportunistic at the end.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_v7.log; }
note "v7 start"

# stage 1 (already in flight from v5): f64 certification
if [ -n "$CERT_PID" ]; then
  while kill -0 "$CERT_PID" 2>/dev/null; do sleep 30; done
  note "certify (inherited pid $CERT_PID) finished"
else
  timeout 4500 python scripts/k36_certify.py > /tmp/q5_certify.log 2>&1
  note "certify rc=$?"
fi

clusters() { # system, outdir, cutoff, seed, tag, nsamples, timeout
  local s=$1 dir=$2 cut=$3 seed=$4 tag=$5 n=$6 to=$7
  for attempt in 1 2; do
    timeout "$to" python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
      --system "$s" --seed "$seed" \
      --output "experiments/$dir/noise_0/cutoff_$cut/$tag.a$attempt" \
      --order 2 --noise 0 --no-annealing --global-cutoff "$cut" \
      --number-samples "$n" > "/tmp/q6_cl_$tag.a$attempt.log" 2>&1 \
      && { note "clusters $tag.a$attempt ok"; return; }
    note "clusters $tag.a$attempt rc=$?"
    seed=$((seed + 1000))
  done
}

curve() { # system, schedule, timeout, extra args...
  local s=$1 sched=$2 to=$3; shift 3
  timeout "$to" python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
    --system "$s" --seed 435834 --output "experiments/$s.csv" \
    --number-sweeps "$sched" \
    --repetitions 1024 --trials 10 --fused-trials --bf16 --resume "$@" \
    >> "/tmp/q6_curve_$s.log" 2>&1 && { note "curve $s ($sched) ok"; return; }
  note "curve $s ($sched) rc=$?"
}

# 2. kagome-36 cluster volume (order-2, reference methodology: greedy only)
clusters heisenberg_kagome_36 kagome 1e-06 530010 kagome.csv.s3b 50 5400

# 3. fair 10-trial random-x0 curves for the stale systems, staged to 12800
rm -f experiments/sk_16_1.csv experiments/sk_16_2.csv experiments/sk_16_3.csv \
      experiments/j1j2_square_4x4.csv
curve sk_16_1 100,200,400,800,1600,3200,6400,12800 2400
curve sk_16_2 100,200,400,800,1600,3200,6400,12800 2400
curve sk_16_3 100,200,400,800,1600,3200,6400,12800 2400
curve j1j2_square_4x4 100,200,400,800,1600,3200,6400,12800 2400

# 4. kagome-18 fair curve (slab tier, geometric ramp; the reference curve
#    reaches P(acc)=1.0 by 6400 sweeps)
rm -f experiments/heisenberg_kagome_18.csv
curve heisenberg_kagome_18 100,400,1600,6400 10000 --schedule geometric --pin-noise-floor

# 5. extend the staged curves to 51200 (--resume: only new points run)
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve sk_16_2 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve sk_16_3 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve j1j2_square_4x4 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200 4200

# 6. kagome-36 SA<->NN annealing loop at reference scale
timeout 8000 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing \
  --number-samples 100000 --number-outer-iterations 2 \
  --sampled-power 1.5 --epochs 120 --batch-size 256 \
  --optimizer adam --learning-rate 3e-3 \
  --output experiments/kagome36_nn_run > /tmp/q6_k36_train.log 2>&1
note "kagome-36 NN loop rc=$?"

# 7. more kagome-36 clusters
clusters heisenberg_kagome_36 kagome 1e-06 530020 kagome.csv.s3c 50 5400

# 8. NQS pyrochlore-32 baseline (CNN amplitudes + SA signs)
timeout 7200 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 300 \
  --pretrain-steps 4000 --width 64 --depth 3 \
  --number-sweeps 2000 --repetitions 64 --burn-in 20 \
  > /tmp/q6_nqs_pyro.log 2>&1
note "NQS pyrochlore rc=$?"

# 9. pyrochlore-32 cluster CSV
clusters heisenberg_pyrochlore_2x2x2 pyrochlore 2e-06 530030 pyrochlore.csv.s3a 40 5400

# 10. opportunistic tails + more clusters
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200,102400 7200
clusters heisenberg_kagome_36 kagome 1e-06 530040 kagome.csv.s3d 50 5400
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200,102400 7200
curve sk_16_2 100,200,400,800,1600,3200,6400,12800,25600,51200,102400 7200
clusters heisenberg_kagome_36 kagome 1e-06 530050 kagome.csv.s3e 50 5400
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 12000
note "v7 queue complete"
