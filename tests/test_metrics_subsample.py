"""Subsampled full-space metrics (train.loop.compute_metrics_on_full_space).

The kagome-36 basis (31.5M states) cannot be exhaustively evaluated inside
every training-loop iteration on a bounded budget, so the loop supports an
unbiased Monte-Carlo estimate (accuracy from uniform draws, overlap from
psi^2 draws — the overlap is exactly the psi^2-expectation of the per-state
sign agreement). Reference semantics: train.py:1216-1240 computes both on
the full space; the estimator must agree within sampling error.
"""

import numpy as np
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.train import (
    compute_metrics_on_full_space,
    init_sign_model,
    make_optimizer,
)
from annealing_sign_problem_tpu.models import DenseSignModel


@pytest.fixture(scope="module")
def small_system():
    config = systems.get_system("heisenberg_kagome_16")
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    _, psi = ed.ground_state(op, num_iter=64, seed=0)
    psi = psi / np.linalg.norm(psi)
    model = DenseSignModel(number_spins=op.basis.number_spins,
                           features=(16, 16), use_batchnorm=False)
    state = init_sign_model(model, op.basis.states[:8],
                            make_optimizer("sgd", 0.1), seed=7)
    return op, psi, state


def test_subsample_estimates_match_exact(small_system):
    op, psi, state = small_system
    exact = compute_metrics_on_full_space(op.basis, psi, state)
    est = compute_metrics_on_full_space(
        op.basis, psi, state, subsample=op.basis.number_states // 2
    )
    assert est["metrics_subsample"] == float(op.basis.number_states // 2)
    # N draws -> stderr <= 0.5/sqrt(N); allow 4 sigma
    tol = 4 * 0.5 / np.sqrt(op.basis.number_states // 2)
    assert abs(est["accuracy"] - exact["accuracy"]) < tol
    assert abs(est["overlap"] - exact["overlap"]) < tol


def test_subsample_at_or_above_n_is_exact(small_system):
    op, psi, state = small_system
    exact = compute_metrics_on_full_space(op.basis, psi, state)
    full = compute_metrics_on_full_space(
        op.basis, psi, state, subsample=op.basis.number_states
    )
    assert full == exact
    assert "metrics_subsample" not in full


def test_auto_engine_is_sparse_on_cpu(monkeypatch):
    """engine='auto' must never pick an MXU-shaped engine on a CPU backend
    (host-side fallback workers; solvers/sa.py tiering)."""
    import jax

    from annealing_sign_problem_tpu.solvers import sa as sa_mod

    if jax.default_backend() != "cpu":
        pytest.skip("CPU-backend-specific tiering")
    import scipy.sparse as sp

    rng = np.random.RandomState(0)
    n = 24
    m = sp.random(n, n, density=0.3, random_state=rng)
    m = m + m.T
    m.setdiag(0)
    m.eliminate_zeros()
    from annealing_sign_problem_tpu.ising import IsingHamiltonian

    h = IsingHamiltonian(sp.csr_matrix(m), np.zeros(n))
    # auto on CPU must route around make_dense_plan entirely
    def _boom(*a, **k):
        raise AssertionError("auto tiering chose the dense engine on CPU")

    monkeypatch.setattr(sa_mod, "make_dense_plan", _boom)
    res = sa_mod.anneal(h, seed=1, number_sweeps=50, repetitions=4,
                        only_best=False)
    assert res.energies_all.shape == (4,)
