"""Mesh tests on the virtual 8-device CPU mesh (SURVEY §4: 'multi-node
without a cluster')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.models import DenseSignModel
from annealing_sign_problem_tpu.ops.sweeps_xla import make_color_plan
from annealing_sign_problem_tpu.parallel import (
    anneal_sharded,
    distribute_clusters,
    make_mesh,
    sharded_matvec_fn,
    train_step_data_parallel,
)
from annealing_sign_problem_tpu.solvers import estimate_betas
from annealing_sign_problem_tpu.train import init_sign_model, make_optimizer

import scipy.sparse

from annealing_sign_problem_tpu.ising import IsingHamiltonian


def random_ising(n, degree, seed):
    rng = np.random.RandomState(seed)
    rows, cols, vals = [], [], []
    for i in range(n):
        for j in rng.choice(n, size=degree, replace=False):
            if i < j:
                rows.append(i), cols.append(j), vals.append(rng.standard_normal())
    m = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(n, n))
    m = 0.5 * (m + m.T)
    return IsingHamiltonian(m.tocsr(), np.zeros(n))


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_anneal_sharded_matches_quality():
    h = random_ising(64, 6, seed=0)
    plan = make_color_plan(h, block_size=32)
    b0, b1 = estimate_betas(h)
    T = 200
    betas = b0 * (b1 / b0) ** (np.arange(T) / (T - 1))
    rng = np.random.RandomState(0)
    R = 16
    x0 = 2.0 * rng.randint(0, 2, size=(R, 64)) - 1.0
    mesh = make_mesh()
    bestS, bestE = anneal_sharded(plan, x0, betas, seed=5, mesh=mesh)
    assert bestS.shape == (R, 64)
    # energies consistent with exact recomputation
    exact = h.energies(bestS)
    # incremental deltas run in f32; exact energies recomputed in f64 may
    # drift by ~1e-4 over hundreds of sweeps
    np.testing.assert_allclose(exact, bestE, atol=1e-3)
    # the sharded anneal finds a decent minimum
    assert bestE.min() < 0


def test_sharded_matvec_matches_dense():
    config = systems.get_system("heisenberg_kagome_16")
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    mesh = make_mesh()
    mv = sharded_matvec_fn(op, mesh, dtype=jnp.float64)
    rng = np.random.RandomState(0)
    x = rng.standard_normal(basis.number_states)
    y = np.asarray(mv(jnp.asarray(x)))
    y_ref = np.asarray(op.matvec(jnp.asarray(x)))
    np.testing.assert_allclose(y, y_ref, rtol=1e-10)


def test_train_step_data_parallel():
    mesh = make_mesh()
    model = DenseSignModel(number_spins=16, features=(32,), use_batchnorm=False)
    spins = np.arange(64, dtype=np.uint64)
    labels = np.random.RandomState(0).randint(0, 2, size=64)
    weights = np.full(64, 1 / 64)
    state = init_sign_model(model, spins[:8], make_optimizer("adam", 1e-2))
    state, loss1 = train_step_data_parallel(state, spins, labels, weights, mesh)
    state, loss2 = train_step_data_parallel(state, spins, labels, weights, mesh)
    assert np.isfinite(loss1) and np.isfinite(loss2)
    assert loss2 < loss1


def test_train_data_parallel_converges_and_matches_single_device():
    """Multi-step convergence: the 8-device DP loop reaches the same loss
    trajectory as single-device training, and the compiled step is cached
    (no per-step recompile)."""
    from annealing_sign_problem_tpu.parallel.mesh import _dp_step_fn

    rng = np.random.RandomState(1)
    spins = rng.randint(0, 1 << 16, size=64).astype(np.uint64)
    # learnable rule: parity of low 4 bits
    labels = (np.bitwise_count(spins & np.uint64(0xF)) % 2).astype(np.int64)
    weights = np.full(64, 1 / 64)

    def run(mesh):
        model = DenseSignModel(number_spins=16, features=(32,), use_batchnorm=False)
        state = init_sign_model(model, spins[:8], make_optimizer("adam", 1e-2), seed=7)
        losses = []
        for _ in range(20):
            state, loss = train_step_data_parallel(state, spins, labels, weights, mesh)
            losses.append(loss)
        return losses

    losses8 = run(make_mesh(8))
    losses1 = run(make_mesh(1))
    assert losses8[-1] < 0.5 * losses8[0]  # converging
    np.testing.assert_allclose(losses8, losses1, rtol=1e-4)
    # step executable cached: one entry per (apply_fn, tx, mesh) key, and
    # repeated calls with the same state hit the cache
    mesh = make_mesh(8)
    model = DenseSignModel(number_spins=16, features=(32,), use_batchnorm=False)
    state = init_sign_model(model, spins[:8], make_optimizer("adam", 1e-2))
    f1 = _dp_step_fn(state.apply_fn, state.tx, mesh)
    f2 = _dp_step_fn(state.apply_fn, state.tx, mesh)
    assert f1 is f2


def test_distribute_clusters_partition():
    all_items = set()
    for w in range(4):
        for i, rng in distribute_clusters(10, seed=3, num_workers=4, worker_id=w):
            assert i not in all_items
            all_items.add(i)
    assert all_items == set(range(10))
    # per-item RNG deterministic across retries
    a = distribute_clusters(10, 3, 4, 1)[0][1].randint(1 << 30)
    b = distribute_clusters(10, 3, 4, 1)[0][1].randint(1 << 30)
    assert a == b


def test_anneal_sharded_dense_matches_quality():
    """The dense-MXU mesh path (previously covered only by the driver
    dryrun): quality and exact-energy consistency on the 8-device mesh,
    plus agreement with the sparse mesh path on the same chains' problem."""
    from annealing_sign_problem_tpu.ops.sweeps_dense import make_dense_plan
    from annealing_sign_problem_tpu.parallel import anneal_sharded_dense

    h = random_ising(64, 6, seed=2)
    plan = make_dense_plan(h, block_size=32)
    b0, b1 = estimate_betas(h)
    T = 200
    betas = b0 * (b1 / b0) ** (np.arange(T) / (T - 1))
    rng = np.random.RandomState(1)
    R = 16
    x0 = 2.0 * rng.randint(0, 2, size=(R, 64)) - 1.0
    mesh = make_mesh()
    bestS, bestE = anneal_sharded_dense(plan, x0, betas, seed=5, mesh=mesh)
    assert bestS.shape == (R, 64)
    exact = h.energies(bestS)
    np.testing.assert_allclose(exact, bestE, atol=1e-3)
    assert bestE.min() < 0

    # same problem through the sparse mesh engine: the two engines share
    # sweep semantics, so their best-replica energies land in the same
    # basin (identical optima are not guaranteed chain-by-chain)
    sparse_plan = make_color_plan(h, block_size=32)
    _, bestE_sparse = anneal_sharded(sparse_plan, x0, betas, seed=5, mesh=mesh)
    assert abs(bestE.min() - bestE_sparse.min()) / abs(bestE_sparse.min()) < 0.05


def test_anneal_sharded_dense_mesh_size_invariance():
    """Identical seeds on 1-device and 8-device meshes produce identical
    trajectories: the sharding is layout-only."""
    from annealing_sign_problem_tpu.ops.sweeps_dense import make_dense_plan
    from annealing_sign_problem_tpu.parallel import anneal_sharded_dense

    h = random_ising(48, 4, seed=3)
    plan = make_dense_plan(h, block_size=16)
    b0, b1 = estimate_betas(h)
    T = 64
    betas = b0 * (b1 / b0) ** (np.arange(T) / (T - 1))
    rng = np.random.RandomState(2)
    R = 8
    x0 = 2.0 * rng.randint(0, 2, size=(R, 48)) - 1.0
    S8, E8 = anneal_sharded_dense(plan, x0, betas, seed=11, mesh=make_mesh(8))
    S1, E1 = anneal_sharded_dense(plan, x0, betas, seed=11, mesh=make_mesh(1))
    np.testing.assert_array_equal(S8, S1)
    np.testing.assert_allclose(E8, E1, rtol=1e-6)
