"""CPU worker for pyrochlore-32 cluster statistics (VERDICT r3 missing #3).

The greedy cluster pipeline (sampled_connected_components) is host-bound:
the C++ parity-union-find greedy solver, the order-k extension, and the
789k-representative basis lookups all run on the host, so pyrochlore rows
can be produced on the CPU while the TPU queue works through the curve
stages (~7 min/sample at order 2, measured). Reference workload:
Makefile pyrochlore_32 target (sampled_connected_components.py:763-769).
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")

from annealing_sign_problem_tpu.experiments import sampled_connected_components as scc

sys.argv = [
    "scc", "--system", "heisenberg_pyrochlore_2x2x2", "--order", "2",
    "--seed", sys.argv[1] if len(sys.argv) > 1 else "990100",
    "--output", "/root/repo/experiments/pyrochlore/noise_0/cutoff_2e-06/pyrochlore.csv.r4cpu",
    "--noise", "0", "--no-annealing", "--global-cutoff", "2e-06",
    "--number-samples", sys.argv[2] if len(sys.argv) > 2 else "64",
    "--resume",
]
scc.main()
