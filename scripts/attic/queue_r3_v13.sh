#!/bin/bash
# Round-3 session-6 queue, v13 (supersedes v12 before its sk_16_3 stage):
# the kagome-18 curve regenerates with the LINEAR schedule — the A/B
# probe (scripts/k18_schedule_probe.py) showed the geometric ramp
# REGRESSES with sweep count on this system (P(acc) 0.844@400 ->
# 0.641@1600 on CPU f32) while linear converges monotonically (0.938@
# 1600) and the informative window adds a bit more (0.953). Then the
# reference-scale NN loop + NQS baseline, the sk32 probe retry (v12's
# attempt hit a relay claim race 3 s after the previous stage exited),
# clusters, and curve extensions as opportunistic tail work.
cd /root/repo || exit 1
export PYTHONPATH="/root/repo:${PYTHONPATH:-/root/.axon_site}"
note() { echo "$(date -u '+%F %T') $*" >> /tmp/queue_v13.log; }
note "v13 start"

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  note "inherited stage (pid $WAIT_PID) finished"
  sleep 45   # let the relay drop the old session before claiming
fi

curve() { # system, schedule, timeout, extra args...
  local s=$1 sched=$2 to=$3; shift 3
  timeout "$to" python -m annealing_sign_problem_tpu.experiments.full_hilbert_space \
    --system "$s" --seed 435834 --output "experiments/$s.csv" \
    --number-sweeps "$sched" \
    --repetitions 1024 --trials 10 --fused-trials --bf16 --resume "$@" \
    >> "/tmp/q13_curve_$s.log" 2>&1 && { note "curve $s ($sched) ok"; return; }
  note "curve $s ($sched) rc=$?"
}

clusters() { # system, outdir, cutoff, seed, tag, nsamples, timeout, noise
  local s=$1 dir=$2 cut=$3 seed=$4 tag=$5 n=$6 to=$7 noise=${8:-0}
  for attempt in 1 2; do
    timeout "$to" python -m annealing_sign_problem_tpu.experiments.sampled_connected_components \
      --system "$s" --seed "$seed" \
      --output "experiments/$dir/noise_$noise/cutoff_$cut/$tag.a$attempt" \
      --order 2 --noise "$noise" --no-annealing --global-cutoff "$cut" \
      --number-samples "$n" > "/tmp/q13_cl_$tag.a$attempt.log" 2>&1 \
      && { note "clusters $tag.a$attempt ok"; return; }
    note "clusters $tag.a$attempt rc=$?"
    seed=$((seed + 1000))
  done
}

# 1. finish the sk_16_3 fair curve through 12800
curve sk_16_3 100,200,400,800,1600,3200,6400,12800 4200

# 2. kagome-18 curve: REGENERATE with the linear schedule + informative
#    window (the committed geometric curve plateaued at 0.70-0.75 vs the
#    reference's 0.9955@1600; probe says linear fixes it)
rm -f experiments/heisenberg_kagome_18.csv
curve heisenberg_kagome_18 100,400,1600,6400 10000 --schedule linear --pin-noise-floor

# 3. kagome-36 SA<->NN annealing loop at reference scale (retry once:
#    axon register() can lose a claim race right after another stage)
for attempt in 1 2; do
  timeout 8000 python -m annealing_sign_problem_tpu.experiments.kagome_train \
    --system heisenberg_kagome_36 --mode annealing \
    --number-samples 100000 --number-outer-iterations 2 \
    --sampled-power 1.5 --epochs 120 --batch-size 256 \
    --number-sa-sweeps 800 --sa-repetitions 8 \
    --optimizer adam --learning-rate 3e-3 \
    --output experiments/kagome36_nn_run > /tmp/q13_k36_train.a$attempt.log 2>&1 \
    && { note "kagome-36 NN loop ok (attempt $attempt)"; break; }
  note "kagome-36 NN loop attempt $attempt rc=$?"
  sleep 45
done

# 4. NQS pyrochlore-32 baseline (CNN amplitudes + SA signs)
timeout 7200 python -m annealing_sign_problem_tpu.experiments.nqs_baseline \
  --system heisenberg_pyrochlore_2x2x2 --amplitude-source network \
  --model cnn --symmetrize --mode sa --number-samples 300 \
  --pretrain-steps 4000 --width 64 --depth 3 \
  --number-sweeps 2000 --repetitions 64 --burn-in 20 \
  > /tmp/q13_nqs_pyro.log 2>&1
note "NQS pyrochlore rc=$?"

# 5. sk_32_1 piece-split matvec probe, attempt 2 (go/no-go for the
#    601M-state ED; v12's attempt died on a claim race)
sleep 60
timeout 2700 python scripts/sk32_probe.py > /tmp/q13_sk32_probe.log 2>&1
note "sk32 probe rc=$?"

# 6. first pyrochlore cluster CSV + more kagome-36 clusters + a noise cell
clusters heisenberg_pyrochlore_2x2x2 pyrochlore 2e-06 530030 pyrochlore.csv.s3a 40 5400
clusters heisenberg_kagome_36 kagome 1e-06 530020 kagome.csv.s3c 50 5400
clusters heisenberg_kagome_36 kagome 1e-06 530060 kagome_noise.csv.s3n 40 5400 2e-1

# 7. curve extensions (kagome-18 deeper points; 51200 for the rest)
curve heisenberg_kagome_18 100,400,1600,6400,12800 6000 --schedule linear --pin-noise-floor
curve sk_16_1 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve sk_16_2 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve sk_16_3 100,200,400,800,1600,3200,6400,12800,25600,51200 4200
curve j1j2_square_4x4 100,200,400,800,1600,3200,6400,12800,25600,51200 4200

# 8. opportunistic: more kagome-36 clusters
clusters heisenberg_kagome_36 kagome 1e-06 530040 kagome.csv.s3d 50 5400
clusters heisenberg_kagome_36 kagome 1e-06 530050 kagome.csv.s3e 50 5400
note "v13 queue complete"
