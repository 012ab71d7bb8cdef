"""Resume the sk_16_3 noise sweep (full eps range at reduced resolution - 100 steps x 40
reps, /root/reference/Makefile:37-48) on the CPU backend so it never
touches the TPU that the round-5 queue owns."""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from annealing_sign_problem_tpu.experiments.analysis import analyze_influence_of_noise

sys.exit(analyze_influence_of_noise([
    "--system", "sk_16_3",
    "--seed", "435834",
    "--output", "experiments/noise/sk_16_3.csv",
    "--min-noise", "1e-2", "--max-noise", "1e2",
    "--steps", "100", "--repetitions", "40",
    "--resume",
]))
