#!/bin/bash
# Round-3 session-3 queue, v9 (supersedes v8): inherits the in-flight
# kagome-36 cluster batch, then prioritises the NN annealing loop and the
# pyrochlore NQS baseline ahead of the 51200-sweep curve extensions so
# the round cannot end with those VERDICT tasks unexecuted.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_v9.log; }
note "v9 start"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  note "inherited stage (pid $WAIT_PID) finished"
fi

clusters() { # system, outdir, cutoff, seed, tag, nsamples, timeout, extra...
  local s=$1 dir=$2 cut=$3 seed=$4 tag=$5 n=$6 to=$7 noise=${8:-0}
  for attempt in 1 2; do
    timeout "$to" python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
      --system "$s" --seed "$seed" \
      --output "experiments/$dir/noise_$noise/cutoff_$cut/$tag.a$attempt" \
      --order 2 --noise "$noise" --no-annealing --global-cutoff "$cut" \
      --number-samples "$n" > "/tmp/q9_cl_$tag.a$attempt.log" 2>&1 \
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
    >> "/tmp/q9_curve_$s.log" 2>&1 && { note "curve $s ($sched) ok"; return; }
  note "curve $s ($sched) rc=$?"
}

# 1. fair 10-trial random-x0 curves for the stale systems, staged to 12800
rm -f experiments/sk_16_1.csv experiments/sk_16_2.csv experiments/sk_16_3.csv \
      experiments/j1j2_square_4x4.csv
curve sk_16_1 100,200,400,800,1600,3200,6400,12800 2400
curve sk_16_2 100,200,400,800,1600,3200,6400,12800 2400
curve sk_16_3 100,200,400,800,1600,3200,6400,12800 2400
curve j1j2_square_4x4 100,200,400,800,1600,3200,6400,12800 2400

# 2. kagome-18 fair curve (slab tier, geometric ramp, pinned noise floor)
rm -f experiments/heisenberg_kagome_18.csv
curve heisenberg_kagome_18 100,400,1600,6400 10000 --schedule geometric --pin-noise-floor

# 3. kagome-36 SA<->NN annealing loop at reference scale
timeout 8000 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing \
  --number-samples 100000 --number-outer-iterations 2 \
  --sampled-power 1.5 --epochs 120 --batch-size 256 \
  --number-sa-sweeps 800 --sa-repetitions 8 \
  --optimizer adam --learning-rate 3e-3 \
  --output experiments/kagome36_nn_run > /tmp/q9_k36_train.log 2>&1
note "kagome-36 NN loop rc=$?"

# 4. NQS pyrochlore-32 baseline (CNN amplitudes + SA signs)
timeout 7200 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 300 \
  --pretrain-steps 4000 --width 64 --depth 3 \
  --number-sweeps 2000 --repetitions 64 --burn-in 20 \
  > /tmp/q9_nqs_pyro.log 2>&1
note "NQS pyrochlore rc=$?"

# 5. more kagome-36 clusters + first pyrochlore cluster CSV + a noise cell
clusters heisenberg_kagome_36 kagome 1e-06 530020 kagome.csv.s3c 50 5400
clusters heisenberg_pyrochlore_2x2x2 pyrochlore 2e-06 530030 pyrochlore.csv.s3a 40 5400
clusters heisenberg_kagome_36 kagome 1e-06 530060 kagome_noise.csv.s3n 40 5400 2e-1

# 6. curve extensions to 51200
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve sk_16_2 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve sk_16_3 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve j1j2_square_4x4 100,200,400,800,1600,3200,6400,12800,25600,51200 4200

# 7. opportunistic: more clusters + deep tails
clusters heisenberg_kagome_36 kagome 1e-06 530040 kagome.csv.s3d 50 5400
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200,102400 7200
clusters heisenberg_kagome_36 kagome 1e-06 530050 kagome.csv.s3e 50 5400
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200,102400 7200
curve heisenberg_kagome_16 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 12000
note "v9 queue complete"
