import numpy as np
import pytest
import scipy.sparse

from annealing_sign_problem_tpu import bits
from annealing_sign_problem_tpu.ising import IsingHamiltonian
from annealing_sign_problem_tpu.solvers import (
    anneal,
    estimate_betas,
    greedy_coloring,
    greedy_solve,
)
from annealing_sign_problem_tpu.solvers import _native
from annealing_sign_problem_tpu.solvers.coloring import color_classes
from annealing_sign_problem_tpu.ops.sweeps_xla import make_color_plan


def random_ising(n, degree, seed, field=False):
    rng = np.random.RandomState(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in rng.choice(n, size=degree, replace=False):
            if i < j:
                rows.append(i)
                cols.append(j)
                vals.append(rng.standard_normal())
    m = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(n, n))
    m = 0.5 * (m + m.T)
    h = rng.standard_normal(n) if field else np.zeros(n)
    return IsingHamiltonian(m.tocsr(), h)


def brute_force_minimum(h: IsingHamiltonian):
    n = h.size
    best_e, best_s = np.inf, None
    for m in range(1 << n):
        s = 2.0 * np.array([(m >> i) & 1 for i in range(n)]) - 1.0
        e = h.energy(s)
        if e < best_e:
            best_e, best_s = e, s
    return best_e, best_s


def test_native_library_builds():
    lib = _native.library()
    assert lib is not None, "C++ solver library failed to build"


def test_coloring_is_proper():
    h = random_ising(200, 6, seed=1)
    colors = greedy_coloring(h.exchange)
    m = h.exchange.tocoo()
    off = m.row != m.col
    assert np.all(colors[m.row[off]] != colors[m.col[off]])
    classes = color_classes(colors)
    assert sum(len(c) for c in classes) == 200


def test_greedy_exact_on_tiny():
    for seed in range(5):
        h = random_ising(10, 4, seed=seed)
        e_exact, _ = brute_force_minimum(h)
        x, e = greedy_solve(h)
        # greedy with polish should be at or near the global optimum on
        # tiny dense-ish problems; always a valid local minimum
        assert e <= 0.0
        assert e >= e_exact - 1e-12
        # local minimality: no single flip improves
        signs = bits.bits_to_signs(x, h.size)
        J = h.exchange.toarray()
        np.fill_diagonal(J, 0.0)
        local = J @ signs
        assert np.all(signs * (2 * local + h.field) <= 1e-12)


def test_greedy_with_field():
    h = random_ising(12, 5, seed=7, field=True)
    e_exact, s_exact = brute_force_minimum(h)
    x, e = greedy_solve(h)
    assert e >= e_exact - 1e-12
    signs = bits.bits_to_signs(x, h.size)
    J = h.exchange.toarray()
    np.fill_diagonal(J, 0.0)
    assert np.all(signs * (2 * J @ signs + h.field) <= 1e-12)


def test_estimate_betas_ordering():
    h = random_ising(50, 6, seed=3)
    b0, b1 = estimate_betas(h)
    assert 0 < b0 < b1


def test_estimate_betas_informative_window():
    """With noise-floor pinning the cooling window must end at the
    smallest INFORMATIVE coupling: sub-reltol couplings belong to spins
    that are overwritten after solving (kagome-18's committed geometric
    curve wasted ~24 of its 37 decades on them and plateaued at
    P(acc) = 0.70 vs the reference's 0.9955)."""
    h = random_ising(50, 6, seed=3)
    m = h.exchange.tolil()
    m[0, 1] = m[1, 0] = 1e-20 * np.abs(h.exchange.data).max()
    h2 = type(h)(m.tocsr(), h.field)
    for schedule in ("linear", "geometric"):
        b0_full, b1_full = estimate_betas(h2, schedule=schedule)
        b0_inf, b1_inf = estimate_betas(
            h2, schedule=schedule, informative_reltol=1e-12
        )
        assert b0_inf == b0_full  # the melt end is untouched
        assert b1_inf < b1_full  # the window no longer chases 1e-20
        # without sub-floor couplings the window is unchanged
        assert estimate_betas(h, schedule=schedule) == estimate_betas(
            h, schedule=schedule, informative_reltol=1e-12
        )


def test_anneal_finds_ground_state_tiny():
    h = random_ising(14, 5, seed=11)
    e_exact, _ = brute_force_minimum(h)
    x, e = anneal(h, seed=42, number_sweeps=300, repetitions=32, only_best=True)
    assert e == pytest.approx(e_exact, abs=1e-8)


def test_anneal_energy_bookkeeping_consistent():
    h = random_ising(60, 6, seed=5)
    res = anneal(
        h, seed=1, number_sweeps=100, repetitions=8, only_best=False
    )
    # reported energies must equal exact recomputation from the signs
    for r in range(8):
        signs = bits.bits_to_signs(res.bits_all[r], h.size)
        assert h.energy(signs) == pytest.approx(res.energies_all[r], abs=1e-8)


def test_anneal_trace_monotone_best():
    h = random_ising(40, 5, seed=9)
    res = anneal(
        h, seed=1, number_sweeps=50, repetitions=4, only_best=False, track_trace=True
    )
    assert res.trace_best.shape == (50, 4)
    # best-energy trace is non-increasing
    assert np.all(np.diff(res.trace_best, axis=0) <= 1e-9)


def test_anneal_with_x0():
    h = random_ising(30, 4, seed=2)
    x0 = bits.signs_to_bits(np.ones(30))
    x, e = anneal(h, x0=x0, seed=3, number_sweeps=200, repetitions=8)
    assert np.isfinite(e)


def test_color_plan_covers_all_spins():
    h = random_ising(100, 6, seed=4)
    plan = make_color_plan(h, block_size=32)
    touched = np.unique(plan.block_spins)
    touched = touched[touched < 100]
    assert len(touched) == 100


def test_bucketed_plans_bounded_shapes_and_correct():
    """Bucketed plans must (a) produce power-of-two kernel shapes shared
    across heterogeneous models and (b) anneal to the same ground states."""
    from annealing_sign_problem_tpu.ops.sweeps_dense import make_dense_plan

    shapes_sparse, shapes_dense = set(), set()
    for n, seed in [(10, 2), (12, 3), (13, 4), (14, 5)]:
        h = random_ising(n, 4, seed=seed)
        sp = make_color_plan(h, bucket=True)
        shapes_sparse.add(
            (sp.block_spins.shape, sp.neighbours.shape, sp.num_spins)
        )
        dp = make_dense_plan(h, bucket=True)
        shapes_dense.add(dp.J.shape)
        exact_e, _ = brute_force_minimum(h)
        for plan in (sp, dp):
            x, e = anneal(h, seed=42, number_sweeps=256, repetitions=32, plan=plan)
            assert len(bits.bits_to_signs(x, n)) == n
            assert e <= exact_e + 1e-6, (n, type(plan).__name__, e, exact_e)
    # the four sizes (10..14 spins) collapse onto O(log) bucketed shapes
    # (the block count still tracks the power-of-two-rounded color count)
    assert len(shapes_sparse) <= 2, shapes_sparse
    assert len(shapes_dense) <= 2, shapes_dense


def test_anneal_philox_rng_finds_ground_state():
    """The philox (XLA RngBitGenerator) acceptance stream is a drop-in
    for threefry on the dense engine: same sweep semantics, same exact
    ground-state recovery, independent random stream."""
    from annealing_sign_problem_tpu.ops.sweeps_dense import make_dense_plan

    h = random_ising(14, 5, seed=11)
    e_exact, _ = brute_force_minimum(h)
    plan = make_dense_plan(h)
    x, e = anneal(
        h, seed=42, number_sweeps=300, repetitions=32, only_best=True,
        plan=plan, rng_impl="philox",
    )
    assert e == pytest.approx(e_exact, abs=1e-8)
    # bookkeeping stays exact under the alternative stream
    res = anneal(
        h, seed=7, number_sweeps=100, repetitions=8, only_best=False,
        plan=plan, rng_impl="philox", descent_sweeps=0,
    )
    for r in range(8):
        signs = bits.bits_to_signs(res.bits_all[r], h.size)
        assert h.energy(signs) == pytest.approx(res.energies_all[r], abs=1e-8)


def test_anneal_dense_replica_group_chunking(monkeypatch):
    """Forcing DENSE_PROGRAM_BYTES low must split the replicas into
    groups (bounded per-program buffers for fused-trials runs) without
    changing the result contract: per-replica energies exact, ground
    state still found, shapes intact."""
    from annealing_sign_problem_tpu.ops.sweeps_dense import make_dense_plan
    from annealing_sign_problem_tpu.solvers import sa as sa_mod

    h = random_ising(14, 5, seed=11)
    e_exact, _ = brute_force_minimum(h)
    plan = make_dense_plan(h)
    # budget of J + 1 byte -> r_max floors at 256, so R=520 runs as
    # 3 groups of 174 with 2 padded replicas sliced off
    monkeypatch.setattr(sa_mod, "DENSE_PROGRAM_BYTES", plan.J.size * 4 + 1)
    calls = []
    real_run = sa_mod.run_annealing_dense

    def counting_run(*args, **kwargs):
        calls.append(args[1].shape)  # signs0 group shape
        return real_run(*args, **kwargs)

    monkeypatch.setattr(sa_mod, "run_annealing_dense", counting_run)
    R = 520
    res = sa_mod.anneal(
        h, seed=42, number_sweeps=300, repetitions=R, plan=plan,
        only_best=False,
    )
    assert calls == [(174, h.size)] * 3  # one compiled shape, 3 groups
    assert res.bits_all.shape[0] == R
    assert res.energies_all.shape == (R,)
    for r in range(0, R, 37):
        signs = bits.bits_to_signs(res.bits_all[r], h.size)
        assert h.energy(signs) == pytest.approx(res.energies_all[r], abs=1e-8)
    assert res.energies_all.min() == pytest.approx(e_exact, abs=1e-8)
    # trace chunking: (T, R) concatenated across groups
    res_t = sa_mod.anneal(
        h, seed=7, number_sweeps=50, repetitions=R, plan=plan,
        only_best=False, track_trace=True, descent_sweeps=0,
    )
    assert res_t.trace_best.shape == (50, R)
    assert res_t.trace_current.shape == (50, R)


def test_anneal_fat_engine_matches_semantics():
    """The color-class ("fat") engine: same sweep semantics as the block
    dense engine — finds the exact optimum on a tiny instance, reports
    exact per-replica energies, and its plan pads less than the block
    layout."""
    from annealing_sign_problem_tpu.ops.sweeps_dense import make_dense_plan
    from annealing_sign_problem_tpu.ops.sweeps_fat import make_fat_plan

    h = random_ising(14, 5, seed=11)
    e_exact, _ = brute_force_minimum(h)
    plan = make_fat_plan(h)
    assert plan.padded_size % 128 == 0
    res = anneal(
        h, seed=42, number_sweeps=300, repetitions=32, plan=plan,
        only_best=False,
    )
    assert res.energies_all.min() == pytest.approx(e_exact, abs=1e-8)
    for r in range(32):
        signs = bits.bits_to_signs(res.bits_all[r], h.size)
        assert h.energy(signs) == pytest.approx(res.energies_all[r], abs=1e-8)

    # a bigger structured instance: padding advantage + quality parity
    h2 = random_ising(600, 12, seed=3)
    dp = make_dense_plan(h2)
    fp = make_fat_plan(h2)
    assert fp.padded_size <= dp.padded_size
    r_dense = anneal(h2, seed=5, number_sweeps=200, repetitions=16,
                     plan=dp, only_best=False)
    r_fat = anneal(h2, seed=5, number_sweeps=200, repetitions=16,
                   plan=fp, only_best=False)
    # engines share semantics, not RNG streams: compare best energies
    assert r_fat.energies_all.min() == pytest.approx(
        r_dense.energies_all.min(), rel=0.02
    )
    # trace shape contract
    r_t = anneal(h, seed=7, number_sweeps=50, repetitions=8, plan=plan,
                 only_best=False, track_trace=True, descent_sweeps=0)
    assert r_t.trace_best.shape == (50, 8)


def test_anneal_restarts_work_conserving_and_consistent():
    """restarts=n: same replica count out, exact energies consistent with
    the reported bits, total attempted flips conserved, and the reduction
    is exactly the per-group energy argmin of the equivalent flat run."""
    h = random_ising(64, 6, seed=11, field=True)
    R, T, n = 32, 120, 4
    multi = anneal(
        h, seed=7, number_sweeps=T, repetitions=R, only_best=False, restarts=n
    )
    assert multi.bits_all.shape[0] == R
    assert multi.energies_all.shape == (R,)
    # reported energies are the exact energies of the reported states
    signs = bits.bits_to_signs_batched(multi.bits_all, h.size)
    np.testing.assert_allclose(h.energies(signs), multi.energies_all, rtol=1e-12)
    # work-conserving: n chains of T//n sweeps (+ per-chain descent)
    assert multi.attempted_flips == n * R * h.size * (T // n + 20)
    # the restart recursion IS the flat R*n-chain run reduced by group
    # energy argmin (same seed -> identical chains)
    flat = anneal(
        h, seed=7, number_sweeps=T // n, repetitions=R * n, only_best=False
    )
    grouped = flat.energies_all.reshape(R, n)
    np.testing.assert_allclose(
        multi.energies_all, grouped.min(axis=1), rtol=1e-12
    )
    pick = np.arange(R) * n + grouped.argmin(axis=1)
    np.testing.assert_array_equal(multi.bits_all, flat.bits_all[pick])


def test_anneal_restarts_only_best_and_clamp():
    h = random_ising(24, 4, seed=3)
    # restarts > number_sweeps clamps instead of producing 0-sweep chains
    x, e = anneal(h, seed=1, number_sweeps=3, repetitions=4, restarts=8)
    signs = bits.bits_to_signs(x, h.size)
    assert e == pytest.approx(h.energy(signs), rel=1e-12)
