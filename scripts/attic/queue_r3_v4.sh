#!/bin/bash
# Round-3 session-2 queue, v4 (supersedes v3): certification first,
# curve tails (the 2.3h 204800-sweep points) pushed to the end, the
# kagome-18 fused curve capped at 6400 sweeps (the reference curve
# reaches P=1.0 there; the 51200 point alone would cost ~7h at
# K=48620), cluster batches interleaved between the long stages.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_s2.log; }

CURVE_PID=$(cat /tmp/s2curve.pid)
while kill -0 "$CURVE_PID" 2>/dev/null; do sleep 60; done
note "v4 start (kagome-16 curve process exited)"

curve() { # system, schedule, timeout, attempts
  local s=$1 sched=$2 to=$3 tries=${4:-2}
  for attempt in $(seq "$tries"); do
    timeout "$to" python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
      --system "$s" --seed 435834 --output "experiments/$s.csv" \
      --number-sweeps "$sched" \
      --repetitions 1024 --trials 10 --fused-trials --bf16 --resume \
      >> "/tmp/q2_curve_$s.log" 2>&1 && { note "curve $s ok"; return; }
    note "curve $s attempt $attempt rc=$?"
  done
}

clusters() { # system, outdir, cutoff, seed, tag
  local s=$1 dir=$2 cut=$3 seed=$4 tag=$5
  timeout 4500 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
    --system "$s" --seed "$seed" \
    --output "experiments/$dir/noise_0/cutoff_$cut/$tag" \
    --order 2 --noise 0 --no-annealing --global-cutoff "$cut" \
    --number-samples 40 > "/tmp/q2_cl_$tag.log" 2>&1
  note "clusters $tag rc=$?"
}

# f64 Rayleigh-quotient certification of the converged kagome-36 vector
timeout 3600 python scripts/k36_certify.py > /tmp/q2_certify.log 2>&1
note "certify rc=$?"

# fair 10-trial curves (51200 covers the saturated systems; tails below)
rm -f experiments/j1j2_square_4x4.csv experiments/sk_16_1.csv \
      experiments/sk_16_2.csv experiments/sk_16_3.csv
curve j1j2_square_4x4 100,200,400,800,1600,3200,6400,12800,25600,51200 5400
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200 5400
curve sk_16_2 100,200,400,800,1600,3200,6400,12800,25600,51200 5400
curve sk_16_3 100,200,400,800,1600,3200,6400,12800,25600,51200 5400

clusters heisenberg_kagome_36 kagome 1e-06 530005 kagome.csv.s2b

# kagome-18 (slab tier, geometric ramp for the deep coupling tail);
rm -f experiments/heisenberg_kagome_18.csv
for attempt in 1 2; do
  timeout 9000 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
    --system heisenberg_kagome_18 --seed 435834 \
    --output experiments/heisenberg_kagome_18.csv \
    --number-sweeps 100,400,1600,6400 \
    --repetitions 1024 --trials 10 --fused-trials --bf16 \
    --schedule geometric --resume \
    >> /tmp/q2_curve_k18.log 2>&1 && break
  note "kagome-18 curve attempt $attempt failed"
done
note "kagome-18 curve done"

# kagome-36 SA<->NN annealing loop at reference scale
timeout 9000 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing \
  --number-samples 100000 --number-outer-iterations 2 \
  --sampled-power 1.5 --epochs 120 --batch-size 256 \
  --optimizer adam --learning-rate 3e-3 \
  --output experiments/kagome36_nn_run > /tmp/q2_k36_train.log 2>&1
note "kagome-36 NN loop rc=$?"

clusters heisenberg_kagome_36 kagome 1e-06 530006 kagome.csv.s2c

# NQS pyrochlore-32 baseline (CNN amplitudes + SA signs)
timeout 7200 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 300 \
  --pretrain-steps 4000 --width 64 --depth 3 \
  --number-sweeps 2000 --repetitions 64 --burn-in 20 \
  > /tmp/q2_nqs_pyro.log 2>&1
note "NQS pyrochlore rc=$?"

clusters heisenberg_pyrochlore_2x2x2 pyrochlore 2e-06 530007 pyrochlore.csv.s2a
clusters heisenberg_kagome_36 kagome 1e-06 530008 kagome.csv.s2d

# curve tails: the expensive final points, opportunistic
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 10800 1
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200,102400 5400 1
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 10800 1
curve sk_16_2 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 14400 1

clusters heisenberg_kagome_36 kagome 1e-06 530009 kagome.csv.s2e
note "v4 queue complete"
