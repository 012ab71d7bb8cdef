"""CPU worker for kagome-36 cluster statistics (VERDICT r3 missing #3 /
next-round item 5).

Measured: one order-2 kagome-36 sample takes ~2 min on the host (the
greedy solve is C++; extension + basis lookups are numpy) — so the noise
cell, the SA-annealed cell, and volume growth can all run CPU-side while
the TPU queue works the convergence curves. Reference workload:
Makefile:101-141 kagome_36 target + Figure 7 SA cells
(sampled_connected_components.py:696-716,763-769).

Stages (each resumable, bounded):
  1. noise=2e-1 cell, 24 samples      (first noise!=0 cell)
  2. SA-annealed noise=0 cell, 16 samples (clusters <=400 spins)
  3. noise=0 volume, 120 samples
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

from annealing_sign_problem_tpu.experiments import sampled_connected_components as scc

BASE = "/root/repo/experiments/kagome"
STAGES = [
    (
        "noise_cell",
        ["--seed", "991010",
         "--output", f"{BASE}/noise_2e-1/cutoff_1e-06/kagome_noise.csv.r4cpu",
         "--noise", "2e-1", "--no-annealing", "--global-cutoff", "1e-06",
         "--number-samples", "24"],
    ),
    (
        "sa_cell",
        ["--seed", "991020",
         "--output", f"{BASE}/noise_0/cutoff_1e-06/kagome_sa.csv.r4cpu",
         "--noise", "0", "--global-cutoff", "1e-06",
         "--number-samples", "16", "--max-cluster-size", "400",
         "--number-sweeps", "1500", "--repetitions", "32"],
    ),
    (
        "volume",
        ["--seed", "991030",
         "--output", f"{BASE}/noise_0/cutoff_1e-06/kagome.csv.r4cpu",
         "--noise", "0", "--no-annealing", "--global-cutoff", "1e-06",
         "--number-samples", "120"],
    ),
]

which = sys.argv[1:] or [name for name, _ in STAGES]
for name, argv in STAGES:
    if name not in which:
        continue
    print(f"=== stage {name}", flush=True)
    sys.argv = ["scc", "--system", "heisenberg_kagome_36", "--order", "2",
                "--resume"] + argv
    try:
        scc.main()
    except SystemExit as e:
        if e.code not in (0, None):
            print(f"=== stage {name} rc={e.code}", flush=True)
            continue
    print(f"=== stage {name} done", flush=True)
