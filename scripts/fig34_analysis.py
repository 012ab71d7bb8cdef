"""Figure 3/4 analysis CSVs at the reference's scale, host-side.

Reference targets (reference Makefile:37-60 and the Figure 3/4 gnuplot
scripts): couplings + is_frustrated for {kagome_16, kagome_18, sk_16_3},
noise sweeps (1000 steps x 100 reps, eps 1e-2..1e2, seed per Makefile)
for {kagome_16, j1j2_square_4x4, kagome_18}. Greedy-based, so this runs
entirely on the host CPU; the noise sweeps are resumable (--resume) and
ordered cheapest-first so an interrupted run still banks whole files.
"""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

from annealing_sign_problem_tpu.experiments import analysis  # noqa: E402

SEED = 263436  # the reference Makefile's SEED (Makefile:7)


def run(fn, argv, label):
    t0 = time.time()
    print(f"=== {label}: {argv}", flush=True)
    try:
        rc = fn(argv)
    except SystemExit as e:  # argparse
        rc = e.code
    print(f"=== {label} rc={rc} ({time.time() - t0:.0f}s)", flush=True)


for s in ("heisenberg_kagome_16", "heisenberg_kagome_18", "sk_16_3"):
    out = f"experiments/couplings/{s}.csv"
    if not os.path.exists(out):
        os.makedirs("experiments/couplings", exist_ok=True)
        run(analysis.analyze_coupling_distribution,
            ["--system", s, "--output", out], f"couplings/{s}")
    out = f"experiments/is_frustrated/{s}.csv"
    if not os.path.exists(out):
        os.makedirs("experiments/is_frustrated", exist_ok=True)
        run(analysis.analyze_probability_of_frustration,
            ["--system", s, "--output", out], f"is_frustrated/{s}")

os.makedirs("experiments/noise", exist_ok=True)
for s in ("heisenberg_kagome_16", "j1j2_square_4x4", "heisenberg_kagome_18"):
    out = f"experiments/noise/{s}.csv"
    run(analysis.analyze_influence_of_noise,
        ["--system", s, "--output", out, "--seed", str(SEED),
         "--min-noise", "1e-2", "--max-noise", "1e2",
         "--steps", "1000", "--repetitions", "100", "--resume"],
        f"noise/{s}")
    stats = analysis.postprocess_influence_of_noise(out)
    print(f"=== wrote {stats}", flush=True)

print("fig34 analysis complete", flush=True)
