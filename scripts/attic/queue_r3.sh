#!/bin/bash
# Round-3 TPU job queue: fires after the kagome-36 f64 polish exits.
# Each stage logs to /tmp/q_*.log; stages run strictly sequentially
# (one process on the TPU at a time).
cd /root/repo || exit 1

K36_PID=$(cat /tmp/k36.pid)
echo "waiting for kagome-36 ED (pid $K36_PID) ..."
while kill -0 "$K36_PID" 2>/dev/null; do sleep 30; done
echo "ED process exited at $(date)"
if ! grep -q "saved h5" /tmp/k36_r3c.log; then
  echo "ABORT: ED did not save the h5 — leaving the TPU to manual control"
  exit 1
fi

# Stage 1: kagome-36 cluster batch 1 (30 clusters vs the converged vector)
timeout 7200 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_kagome_36 --seed 520001 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome.csv.r3a \
  --order 2 --noise 0 --no-annealing --global-cutoff 1e-06 \
  --number-samples 30 > /tmp/q_k36_clusters_a.log 2>&1
echo "stage 1 (k36 clusters batch A) done at $(date)"

# Stage 2: kagome-16 full-schedule fair curve (fused 10 trials, bf16)
rm -f experiments/heisenberg_kagome_16.csv
timeout 21600 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
  --system heisenberg_kagome_16 --seed 435834 \
  --output experiments/heisenberg_kagome_16.csv \
  --number-sweeps 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 \
  --repetitions 1024 --trials 10 --fused-trials --bf16 \
  > /tmp/q_curve_k16.log 2>&1
echo "stage 2 (kagome-16 curve) done at $(date)"

# Stage 3: the other 16-spin systems to 51200 sweeps (extend later w/ --resume)
for s in j1j2_square_4x4 sk_16_1 sk_16_2 sk_16_3; do
  rm -f experiments/$s.csv
  timeout 10800 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
    --system $s --seed 435834 \
    --output experiments/$s.csv \
    --number-sweeps 100,200,400,800,1600,3200,6400,12800,25600,51200 \
    --repetitions 1024 --trials 10 --fused-trials --bf16 \
    > /tmp/q_curve_$s.log 2>&1
  echo "stage 3 ($s curve) done at $(date)"
done
echo "queue complete at $(date)"
