"""Measure the multi-slab MXU engine at the kagome-36 order-2 cluster
scale (K ~ 3.3e4 — VERDICT round-2 item 3's target shape) on the real
chip, ahead of the driver's round-end bench.py capture. Prints ONE JSON
line. Run from /root/repo with the TPU free.
"""
import json
import sys
import time

import numpy as np
import scipy.sparse

from annealing_sign_problem_tpu.ising import IsingHamiltonian
from annealing_sign_problem_tpu.ops.sweeps_slab import make_slab_plan
from annealing_sign_problem_tpu.solvers import anneal


def main():
    Ks, Ds, R = 33_000, 48, 1024
    rng = np.random.RandomState(0)
    rows = np.repeat(np.arange(Ks), Ds // 2)
    cols = rng.randint(0, Ks, size=rows.size)
    keep = rows != cols
    m = scipy.sparse.coo_matrix(
        (rng.standard_normal(keep.sum()), (rows[keep], cols[keep])),
        shape=(Ks, Ks),
    )
    hs = IsingHamiltonian((0.5 * (m + m.T)).tocsr(), np.zeros(Ks))
    t0 = time.time()
    splan = make_slab_plan(hs, j_dtype="bfloat16")
    print(
        f"slab plan: {splan.num_slabs} slabs, Kp={splan.padded_size} "
        f"({time.time()-t0:.0f}s)",
        file=sys.stderr, flush=True,
    )
    t0 = time.time()
    anneal(hs, seed=2, number_sweeps=24, repetitions=R, plan=splan,
           descent_sweeps=0)
    print(f"compile+warmup {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
    best = 0.0
    for trial in range(2):
        r = anneal(hs, seed=6 + trial, number_sweeps=192, repetitions=R,
                   plan=splan, only_best=False, descent_sweeps=0)
        print(f"trial {trial}: {r.elapsed:.2f}s -> "
              f"{r.flips_per_second:.4g} flips/s", file=sys.stderr, flush=True)
        best = max(best, r.flips_per_second)
    print(json.dumps({
        "probe": "slab_engine_K33000_bf16",
        "K": Ks, "R": R, "Kp": splan.padded_size,
        "num_slabs": splan.num_slabs,
        "flips_per_second": best,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
