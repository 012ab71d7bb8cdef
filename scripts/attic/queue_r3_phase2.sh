#!/bin/bash
# Phase-2 TPU queue: chains after queue_r3.sh (curves) completes.
cd /root/repo || exit 1
Q1_PID=$(cat /tmp/queue.pid)
echo "waiting for phase-1 queue (pid $Q1_PID) ..."
while kill -0 "$Q1_PID" 2>/dev/null; do sleep 30; done
grep -q "queue complete" /tmp/queue_r3.log || {
  echo "ABORT: phase-1 queue did not complete"; exit 1; }

# Stage 4: NQS pyrochlore-32 baseline on TPU (CNN + symmetrised amplitudes)
timeout 5400 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 300 \
  --pretrain-steps 4000 --width 64 --depth 3 \
  --number-sweeps 2000 --repetitions 64 --burn-in 20 \
  > /tmp/q_nqs_pyro.log 2>&1
echo "stage 4 (NQS pyrochlore baseline) done at $(date)"

# Stage 5: pyrochlore-32 cluster batch (first rows for that system)
timeout 5400 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_pyrochlore_2x2x2 --seed 520002 \
  --output experiments/pyrochlore/noise_0/cutoff_2e-06/pyrochlore.csv.r3a \
  --order 2 --noise 0 --no-annealing --global-cutoff 2e-06 \
  --number-samples 30 > /tmp/q_pyro_clusters.log 2>&1
echo "stage 5 (pyrochlore clusters) done at $(date)"

# Stage 6: kagome-36 SA<->NN annealing loop at reference scale
timeout 7200 python -m annealing_sign_problem_tpu.experiments.kagome_train \
  --system heisenberg_kagome_36 --mode annealing \
  --number-samples 100000 --number-outer-iterations 2 \
  --sampled-power 1.5 --epochs 120 --batch-size 256 \
  --optimizer adam --learning-rate 3e-3 \
  --output experiments/kagome36_nn_run > /tmp/q_k36_train.log 2>&1
echo "stage 6 (kagome-36 NN annealing loop) done at $(date)"
echo "phase-2 queue complete at $(date)"
