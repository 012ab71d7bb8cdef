#!/bin/bash
# Chains after queue_r3_session2.sh: f64 energy certification, the
# glassy sk_16_1 curve extension to the full reference schedule, and a
# third kagome-36 cluster batch.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_s2.log; }

Q_PID=$(cat /tmp/queue_s2.pid)
while kill -0 "$Q_PID" 2>/dev/null; do sleep 60; done
note "queue2b start"

# S9: f64 Rayleigh-quotient certification of the kagome-36 vector
timeout 3600 python scripts/k36_certify.py > /tmp/q2_certify.log 2>&1
note "S9 k36 f64 certification rc=$?"

# S10: sk_16_1 (the glassy instance: the only 16-spin curve not yet
# saturated at 51200) to the reference's full 204800-sweep schedule
timeout 7200 python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
  --system sk_16_1 --seed 435834 \
  --output experiments/sk_16_1.csv \
  --number-sweeps 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 \
  --repetitions 1024 --trials 10 --fused-trials --bf16 --resume \
  > /tmp/q2_curve_sk1_ext.log 2>&1
note "S10 sk_16_1 extension rc=$?"

# S11: kagome-36 cluster batch C
timeout 7200 python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
  --system heisenberg_kagome_36 --seed 530004 \
  --output experiments/kagome/noise_0/cutoff_1e-06/kagome.csv.s2c \
  --order 2 --noise 0 --no-annealing --global-cutoff 1e-06 \
  --number-samples 40 > /tmp/q2_k36_cl_c.log 2>&1
note "S11 k36 clusters C rc=$?"

note "queue2b complete"
