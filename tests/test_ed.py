import numpy as np
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.basis import SpinBasis
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.operator import Operator, TermGroup


def make_operator(config):
    basis = basis_from_config(config).build()
    return operator_from_config(config, basis)


def test_ground_state_heisenberg_ring():
    bonds = [[i, (i + 1) % 8] for i in range(8)]
    basis = SpinBasis(number_spins=8, hamming_weight=4).build()
    op = Operator(basis, [TermGroup(np.array(systems.heisenberg_matrix()), np.array(bonds))])
    energy, psi = ed.ground_state(op, num_iter=64, seed=3)
    dense = op.to_scipy_sparse().toarray()
    evals, evecs = np.linalg.eigh(dense)
    assert energy == pytest.approx(evals[0], abs=1e-9)
    overlap = abs(np.dot(psi, evecs[:, 0]))
    assert overlap == pytest.approx(1.0, abs=1e-8)


def test_ground_state_sk16():
    config = systems.sk_instances()["sk_16_1"]
    op = make_operator(config)
    energy, psi = ed.ground_state(op, num_iter=96, seed=0)
    # Rayleigh quotient consistency + residual
    import jax.numpy as jnp

    hx = np.asarray(op.matvec(jnp.asarray(psi)))
    rayleigh = float(psi @ hx)
    assert energy == pytest.approx(rayleigh, abs=1e-8)
    residual = np.linalg.norm(hx - energy * psi)
    assert residual < 1e-6
    assert np.linalg.norm(psi) == pytest.approx(1.0, abs=1e-12)


def test_expectation_matches_energy():
    config = systems.j1j2_square(4, 4, 0.55)
    op = make_operator(config)
    energy, psi = ed.ground_state(op, num_iter=128, seed=1)
    assert op.expectation(psi) == pytest.approx(energy, abs=1e-8)
