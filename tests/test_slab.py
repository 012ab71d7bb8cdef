"""Multi-slab dense engine (ops/sweeps_slab.py).

The slab engine processes the same block-major blocks in the same order
with the same per-(sweep, block) PRNG stream as the single-buffer dense
engine, so with float32 couplings the two chains must be IDENTICAL —
exactness pinned here. Also covers auto-selection and the solver surface.
"""

import numpy as np

from annealing_sign_problem_tpu.ops.sweeps_dense import make_dense_plan, run_annealing_dense
from annealing_sign_problem_tpu.ops.sweeps_slab import (
    make_slab_plan,
    run_annealing_slab,
)
from annealing_sign_problem_tpu.solvers import anneal
from annealing_sign_problem_tpu.solvers.sa import estimate_betas, make_schedule

from test_solvers import random_ising


def test_slab_matches_dense_exactly():
    h = random_ising(600, 8, seed=3)
    R, T = 32, 40
    beta0, beta1 = estimate_betas(h)
    betas = make_schedule(beta0, beta1, T)
    rng = np.random.RandomState(0)
    x0 = 2.0 * rng.randint(0, 2, size=(R, h.size)) - 1.0

    dplan = make_dense_plan(h, block_size=64)
    # force >= 3 slabs with a deliberately tiny byte budget
    splan = make_slab_plan(h, block_size=64, slab_bytes=dplan.J.nbytes // 3)
    assert splan.num_slabs >= 3
    assert splan.J.shape == dplan.J.shape

    Sd, Ed, bestSd, bestEd, _ = run_annealing_dense(dplan, x0, betas, seed=7)
    Ss, Es, bestSs, bestEs, _ = run_annealing_slab(
        splan, x0, betas, seed=7, energies0=h.energies(x0), sync_every=16
    )
    np.testing.assert_array_equal(Ss, Sd)
    np.testing.assert_array_equal(bestSs, bestSd)
    np.testing.assert_allclose(Es, Ed, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(bestEs, bestEd, rtol=1e-5, atol=1e-4)


def test_slab_bf16_anneals():
    h = random_ising(300, 6, seed=5)
    R, T = 16, 60
    beta0, beta1 = estimate_betas(h)
    betas = make_schedule(beta0, beta1, T)
    rng = np.random.RandomState(1)
    x0 = 2.0 * rng.randint(0, 2, size=(R, h.size)) - 1.0
    splan = make_slab_plan(h, block_size=64, slab_bytes=1 << 18, j_dtype="bfloat16")
    assert splan.num_slabs >= 2
    _, E, bestS, bestE, _ = run_annealing_slab(
        splan, x0, betas, seed=3, energies0=h.energies(x0)
    )
    # energies drop substantially from the random start
    assert bestE.mean() < 0.5 * h.energies(x0).mean()
    # reported best energies agree with exact recomputation to f32 slack
    np.testing.assert_allclose(h.energies(bestS), bestE, rtol=1e-2, atol=1e-2)


def test_anneal_accepts_slab_plan():
    h = random_ising(400, 6, seed=9)
    splan = make_slab_plan(h, block_size=64, slab_bytes=1 << 19)
    res = anneal(h, seed=11, number_sweeps=30, repetitions=8, only_best=False,
                 plan=splan)
    assert res.bits_all.shape[0] == 8
    # descent + best-of-chain merge: reported energies are exact and
    # no worse than the best-of-chain snapshot
    exact = h.energies(
        np.stack([
            2.0 * np.unpackbits(
                res.bits_all[r].view(np.uint8), count=h.size, bitorder="little"
            ).astype(np.float64) - 1.0
            for r in range(8)
        ])
    )
    np.testing.assert_allclose(exact, res.energies_all, rtol=1e-9, atol=1e-9)
