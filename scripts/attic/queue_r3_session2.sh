#!/bin/bash
# Round-3 session-2 TPU queue: runs after the converged kagome-36 h5
# export. Stages run strictly sequentially (one process on the TPU at a
# time); each logs to /tmp/q2_*.log and appends a status line to
# /tmp/queue_s2.log. Stages continue on failure (partial CSVs are
# append-only and still useful).
cd /root/repo || exit 1
# keep /root/.axon_site on PYTHONPATH — that's how the axon TPU plugin registers
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"

note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_s2.log; }
note "queue start"

# S1: kagome-36 cluster batch A vs the converged vector (one row per
# cluster, append-only -> a timeout keeps whatever finished)
timeout 7200 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_kagome_36 --seed 530001 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome.csv.s2a \
  --order 2 --noise 0 --no-annealing --global-cutoff 1e-06 \
  --number-samples 40 > /tmp/q2_k36_cl_a.log 2>&1
note "S1 k36 clusters A rc=$?"

# S2: kagome-16 fair curve, full reference schedule, 10 fused trials
timeout 14400 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
  --system heisenberg_kagome_16 --seed 435834 \
  --output experiments/heisenberg_kagome_16.csv \
  --number-sweeps 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 \
  --repetitions 1024 --trials 10 --fused-trials --bf16 --resume \
  > /tmp/q2_curve_k16.log 2>&1
note "S2 kagome-16 curve rc=$?"

# S3: the other 16-spin systems, 10 fused trials to 51200
for s in j1j2_square_4x4 sk_16_1 sk_16_2 sk_16_3; do
  rm -f experiments/$s.csv
  timeout 5400 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
    --system $s --seed 435834 \
    --output experiments/$s.csv \
    --number-sweeps 100,200,400,800,1600,3200,6400,12800,25600,51200 \
    --repetitions 1024 --trials 10 --fused-trials --bf16 --resume \
    > /tmp/q2_curve_$s.log 2>&1
  note "S3 $s curve rc=$?"
done

# S4: kagome-36 cluster batch B
timeout 7200 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_kagome_36 --seed 530002 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome.csv.s2b \
  --order 2 --noise 0 --no-annealing --global-cutoff 1e-06 \
  --number-samples 40 > /tmp/q2_k36_cl_b.log 2>&1
note "S4 k36 clusters B rc=$?"

# S5: kagome-18 curve (slab engine tier, geometric ramp for the deep
# coupling tail)
timeout 10800 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
  --system heisenberg_kagome_18 --seed 435834 \
  --output experiments/heisenberg_kagome_18.csv \
  --number-sweeps 100,400,1600,6400,25600,51200 \
  --repetitions 1024 --trials 10 --fused-trials --bf16 --schedule geometric --resume \
  > /tmp/q2_curve_k18.log 2>&1
note "S5 kagome-18 curve rc=$?"

# S6: kagome-36 SA<->NN annealing loop at reference scale
timeout 7200 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing \
  --number-samples 100000 --number-outer-iterations 2 \
  --sampled-power 1.5 --epochs 120 --batch-size 256 \
  --optimizer adam --learning-rate 3e-3 \
  --output experiments/kagome36_nn_run > /tmp/q2_k36_train.log 2>&1
note "S6 kagome-36 NN loop rc=$?"

# S7: NQS pyrochlore-32 baseline (CNN amplitudes + SA signs)
timeout 5400 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 300 \
  --pretrain-steps 4000 --width 64 --depth 3 \
  --number-sweeps 2000 --repetitions 64 --burn-in 20 \
  > /tmp/q2_nqs_pyro.log 2>&1
note "S7 NQS pyrochlore rc=$?"

# S8: pyrochlore-32 cluster batch (first rows for that system)
timeout 5400 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_pyrochlore_2x2x2 --seed 530003 \
  --output experiments/pyrochlore/noise_0/cutoff_2e-06/pyrochlore.csv.s2a \
  --order 2 --noise 0 --no-annealing --global-cutoff 2e-06 \
  --number-samples 40 > /tmp/q2_pyro_cl.log 2>&1
note "S8 pyrochlore clusters rc=$?"

note "queue complete"
