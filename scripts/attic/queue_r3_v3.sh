#!/bin/bash
# Round-3 session-2 queue, v3: retry-hardened (the relay's remote
# compiler intermittently returns HTTP 500 and kills a run; curve stages
# resume from their CSV, cluster stages append under fresh seeds).
# Waits for the in-flight kagome-16 curve (started by the v1 queue),
# then runs everything else strictly sequentially.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_s2.log; }

CURVE_PID=$(cat /tmp/s2curve.pid)
while kill -0 "$CURVE_PID" 2>/dev/null; do sleep 60; done
note "v3 start (kagome-16 curve done)"

curve() { # system, schedule, extra flags...
  local s=$1 sched=$2; shift 2
  for attempt in 1 2 3; do
    timeout 7200 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
      --system "$s" --seed 435834 --output "experiments/$s.csv" \
      --number-sweeps "$sched" \
      --repetitions 1024 --trials 10 --fused-trials --bf16 --resume "$@" \
      >> "/tmp/q2_curve_$s.log" 2>&1 && break
    note "curve $s attempt $attempt failed rc=$?"
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

# S3: remaining 16-spin fair curves (sk_16_1 gets the full schedule: it
# is the only glassy instance still unsaturated at 51200)
rm -f experiments/j1j2_square_4x4.csv experiments/sk_16_1.csv \
      experiments/sk_16_2.csv experiments/sk_16_3.csv
curve j1j2_square_4x4 100,200,400,800,1600,3200,6400,12800,25600,51200
note "S3 j1j2 done"
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800
note "S3 sk_16_1 done"
curve sk_16_2 100,200,400,800,1600,3200,6400,12800,25600,51200
note "S3 sk_16_2 done"
curve sk_16_3 100,200,400,800,1600,3200,6400,12800,25600,51200
note "S3 sk_16_3 done"

# S9: f64 Rayleigh-quotient certification of the converged kagome-36 vector
timeout 3600 python scripts/k36_certify.py > /tmp/q2_certify.log 2>&1
note "S9 k36 f64 certification rc=$?"

# S4: kagome-36 cluster batch B (fresh seed per attempt; rows append)
clusters heisenberg_kagome_36 kagome 1e-06 530005 kagome.csv.s2b

# S5: kagome-18 curve (slab engine tier, geometric ramp)
rm -f experiments/heisenberg_kagome_18.csv
for attempt in 1 2 3; do
  timeout 7200 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
    --system heisenberg_kagome_18 --seed 435834 \
    --output experiments/heisenberg_kagome_18.csv \
    --number-sweeps 100,400,1600,6400,25600,51200 \
    --repetitions 1024 --trials 10 --fused-trials --bf16 \
    --schedule geometric --resume \
    >> /tmp/q2_curve_k18.log 2>&1 && break
  note "kagome-18 curve attempt $attempt failed"
done
note "S5 kagome-18 curve done"

# S6: kagome-36 SA<->NN annealing loop at reference scale
timeout 9000 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing \
  --number-samples 100000 --number-outer-iterations 2 \
  --sampled-power 1.5 --epochs 120 --batch-size 256 \
  --optimizer adam --learning-rate 3e-3 \
  --output experiments/kagome36_nn_run > /tmp/q2_k36_train.log 2>&1
note "S6 kagome-36 NN loop rc=$?"

# S4b: kagome-36 cluster batch C
clusters heisenberg_kagome_36 kagome 1e-06 530006 kagome.csv.s2c

# S7: NQS pyrochlore-32 baseline (CNN amplitudes + SA signs)
timeout 7200 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 300 \
  --pretrain-steps 4000 --width 64 --depth 3 \
  --number-sweeps 2000 --repetitions 64 --burn-in 20 \
  > /tmp/q2_nqs_pyro.log 2>&1
note "S7 NQS pyrochlore rc=$?"

# S8: pyrochlore-32 cluster batch
clusters heisenberg_pyrochlore_2x2x2 pyrochlore 2e-06 530007 pyrochlore.csv.s2a

# S4c: kagome-36 cluster batch D
clusters heisenberg_kagome_36 kagome 1e-06 530008 kagome.csv.s2d

note "v3 queue complete"
