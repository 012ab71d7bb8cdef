#!/bin/bash
# Round-3 session-3 queue, v5 (supersedes v4, which died with the previous
# session): certification first, then cluster volume with the row-block
# OOM fix, then the kagome-18 fair curve, the reference-scale kagome-36
# NN loop, the pyrochlore NQS baseline, and curve tails last.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_v5.log; }
note "v5 start"

clusters() { # system, outdir, cutoff, seed, tag, nsamples, timeout
  local s=$1 dir=$2 cut=$3 seed=$4 tag=$5 n=$6 to=$7
  for attempt in 1 2; do
    timeout "$to" python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
      --system "$s" --seed "$seed" \
      --output "experiments/$dir/noise_0/cutoff_$cut/$tag.a$attempt" \
      --order 2 --noise 0 --no-annealing --global-cutoff "$cut" \
      --number-samples "$n" > "/tmp/q5_cl_$tag.a$attempt.log" 2>&1 \
      && { note "clusters $tag.a$attempt ok"; return; }
    note "clusters $tag.a$attempt rc=$?"
    seed=$((seed + 1000))
  done
}

curve() { # system, schedule, timeout, extra args...
  local s=$1 sched=$2 to=$3; shift 3
  for attempt in 1 2; do
    timeout "$to" python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
      --system "$s" --seed 435834 --output "experiments/$s.csv" \
      --number-sweeps "$sched" \
      --repetitions 1024 --trials 10 --fused-trials --bf16 --resume "$@" \
      >> "/tmp/q5_curve_$s.log" 2>&1 && { note "curve $s ok"; return; }
    note "curve $s attempt $attempt rc=$?"
  done
}

# 1. f64 Rayleigh-quotient certification of the converged kagome-36 vector
timeout 4500 python scripts/k36_certify.py > /tmp/q5_certify.log 2>&1
note "certify rc=$?"

# 2-3. kagome-36 cluster volume (order-2, reference methodology: greedy only)
clusters heisenberg_kagome_36 kagome 1e-06 530010 kagome.csv.s3b 50 5400
clusters heisenberg_kagome_36 kagome 1e-06 530020 kagome.csv.s3c 50 5400

# 4. kagome-18 fair curve (slab tier, geometric ramp; reference saturates
#    P(acc)=1.0 by 6400 sweeps, so the curve is complete there)
rm -f experiments/heisenberg_kagome_18.csv
curve heisenberg_kagome_18 100,400,1600,6400 10000 --schedule geometric

# 5. kagome-36 SA<->NN annealing loop at reference scale
timeout 10000 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing \
  --number-samples 100000 --number-outer-iterations 2 \
  --sampled-power 1.5 --epochs 120 --batch-size 256 \
  --optimizer adam --learning-rate 3e-3 \
  --output experiments/kagome36_nn_run > /tmp/q5_k36_train.log 2>&1
note "kagome-36 NN loop rc=$?"

# 6. NQS pyrochlore-32 baseline (CNN amplitudes + SA signs)
timeout 7200 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 300 \
  --pretrain-steps 4000 --width 64 --depth 3 \
  --number-sweeps 2000 --repetitions 64 --burn-in 20 \
  > /tmp/q5_nqs_pyro.log 2>&1
note "NQS pyrochlore rc=$?"

# 7. pyrochlore-32 cluster CSV
clusters heisenberg_pyrochlore_2x2x2 pyrochlore 2e-06 530030 pyrochlore.csv.s3a 40 5400

# 8. kagome-16 curve tail (resume; 51200 then the deep points)
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200 5400
clusters heisenberg_kagome_36 kagome 1e-06 530040 kagome.csv.s3d 50 5400
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200,102400 7200
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200,102400 7200
clusters heisenberg_kagome_36 kagome 1e-06 530050 kagome.csv.s3e 50 5400
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 12000
note "v5 queue complete"
