"""Minimum end-to-end slice (SURVEY §7): j1j2_square_4x4 with zero external
data — recompute ED, build the full-basis Ising model, solve with greedy
and SA, check accuracy/overlap against the exact signs (the reference's
``make quality_check`` path, common.py:838-856)."""

import numpy as np
import pytest

from annealing_sign_problem_tpu import bits, ed, systems
from annealing_sign_problem_tpu.amplitudes import (
    determine_exact_solution,
    ground_state_to_log_coeff_fn,
)
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.ising import make_ising_model
from annealing_sign_problem_tpu.metrics import compute_accuracy_and_overlap
from annealing_sign_problem_tpu.solvers import anneal, greedy_solve, solve_ising_model


@pytest.fixture(scope="module")
def j1j2_setup():
    config = systems.j1j2_square(4, 4, 0.55)
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    energy, psi = ed.ground_state(op, num_iter=128, seed=0)
    return op, energy, psi


def test_ed_dimension(j1j2_setup):
    op, energy, psi = j1j2_setup
    assert op.basis.number_states == 12870
    # frustrated model: the ground state has both signs
    assert (psi > 0).any() and (psi < 0).any()


def test_quality_check_greedy(j1j2_setup):
    """Full-basis greedy solve reaches high sign accuracy and overlap."""
    op, energy, psi = j1j2_setup
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    exact_bits = determine_exact_solution(op.basis.states, op, psi)
    weights = psi**2

    # the Ising ground state reproduces the quantum energy at the exact signs
    assert model.ising_hamiltonian.energy(exact_bits) == pytest.approx(
        energy, abs=1e-7
    )

    x = solve_ising_model(model, mode="greedy")
    accuracy, overlap = compute_accuracy_and_overlap(x, exact_bits, weights)
    # deterministic greedy: strong overlap on this system (paper Table 1)
    assert overlap > 0.95
    assert accuracy > 0.8


def test_sa_beats_greedy_energy(j1j2_setup):
    op, energy, psi = j1j2_setup
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    _, e_greedy = greedy_solve(model.ising_hamiltonian)
    x, e_sa = anneal(
        model.ising_hamiltonian,
        seed=12345,
        number_sweeps=64,
        repetitions=4,
        only_best=True,
    )
    # both solvers go below zero; SA short run is a smoke test on CPU, the
    # statistical convergence curves are validated on TPU (bench/experiments)
    assert e_greedy < 0
    assert e_sa < 0
    exact_bits = determine_exact_solution(op.basis.states, op, psi)
    accuracy, overlap = compute_accuracy_and_overlap(x, exact_bits, psi**2)
    assert accuracy > 0.5
