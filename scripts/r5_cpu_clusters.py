"""Round-5 CPU cluster worker: round-robin volume growth across every
kagome-36 / pyrochlore-32 cluster cell (VERDICT r4 missing #4 / next #6).

Unlike the round-4 workers (fixed per-stage sample totals, so the first
stage hogged the core), this loops over the cells in small chunks: each
pass counts the rows already banked (resume-aware) and asks for +CHUNK
more, so every cell grows all round and a kill at any moment loses at
most one cluster. Runs forever; the winddown script commits snapshots.

Greedy cluster rows are host-bound (C++ union-find + numpy extension),
~2 min/row kagome order-2 and ~7 min/row pyrochlore order-2 uncontended.
"""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

from annealing_sign_problem_tpu.experiments import sampled_connected_components as scc
from annealing_sign_problem_tpu.experiments.sampled_connected_components import (
    count_completed_rows,
)

KAG = "experiments/kagome"
PYR = "experiments/pyrochlore"

# (label, output, chunk, extra argv) — chunk sizes weight the mix toward
# the noise cells (severely under-sampled: 13-24 rows vs the reference's
# 50,000) while noise=0 volume keeps growing too.
CELLS = [
    ("k36_vol", f"{KAG}/noise_0/cutoff_1e-06/kagome.csv.r5cpu", 6,
     ["--system", "heisenberg_kagome_36", "--order", "2", "--seed", "995030",
      "--noise", "0", "--no-annealing", "--global-cutoff", "1e-06"]),
    ("k36_noise_mid", f"{KAG}/noise_1e-2/cutoff_1e-06/kagome_noise.csv.r5cpu", 6,
     ["--system", "heisenberg_kagome_36", "--order", "2", "--seed", "995040",
      "--noise", "1e-2", "--no-annealing", "--global-cutoff", "1e-06"]),
    ("k36_noise_hi", f"{KAG}/noise_2e-1/cutoff_1e-06/kagome_noise.csv.r5cpu", 6,
     ["--system", "heisenberg_kagome_36", "--order", "2", "--seed", "995010",
      "--noise", "2e-1", "--no-annealing", "--global-cutoff", "1e-06"]),
    ("k36_sa_o1", f"{KAG}/noise_0/cutoff_1e-06/kagome_sa_o1.csv.r5cpu", 4,
     ["--system", "heisenberg_kagome_36", "--order", "1", "--seed", "995020",
      "--noise", "0", "--global-cutoff", "1e-06", "--max-cluster-size", "400",
      "--number-sweeps", "1500", "--repetitions", "32"]),
    ("pyro_vol", f"{PYR}/noise_0/cutoff_2e-06/pyrochlore.csv.r5cpu", 2,
     ["--system", "heisenberg_pyrochlore_2x2x2", "--order", "2",
      "--seed", "995050", "--noise", "0", "--no-annealing",
      "--global-cutoff", "2e-06"]),
]


def run_cell(label, output, chunk, extra):
    have = count_completed_rows(output) if os.path.exists(output) else 0
    target = have + chunk
    print(f"=== {label}: {have} rows -> target {target}", flush=True)
    argv = extra + ["--output", output, "--number-samples", str(target),
                    "--resume"]
    t0 = time.time()
    try:
        rc = scc.main(argv)
    except SystemExit as e:
        rc = e.code
    except Exception as e:  # keep the loop alive across one-off failures
        print(f"=== {label} FAILED: {e!r}", flush=True)
        return
    print(f"=== {label} rc={rc} (+{chunk} in {time.time() - t0:.0f}s)", flush=True)


while True:
    for cell in CELLS:
        run_cell(*cell)
    time.sleep(5)
