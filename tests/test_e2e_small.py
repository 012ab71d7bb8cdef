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
    # deterministic greedy solves this system exactly (paper Table 1,
    # RESULTS.md: accuracy 1.0000, overlap 1.000000)
    assert overlap > 0.9999
    assert accuracy > 0.999


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


TABLE1 = [
    # measured `make quality_check` values (RESULTS.md Table 1); the
    # reference reports ~1.0 for these systems (common.py:838-856)
    ("heisenberg_kagome_16", 0.9999, 0.99999),
    ("j1j2_square_4x4", 0.9999, 0.99999),
    ("sk_16_1", 0.999, 0.99999),
    ("heisenberg_kagome_18", 0.984, 0.99999),
]


@pytest.mark.parametrize("system,min_acc,min_overlap", TABLE1)
def test_quality_table1_exact_values(system, min_acc, min_overlap):
    """Greedy Table-1 quality pinned per system using the committed ED
    caches (physical_systems/data-small)."""
    import os

    from annealing_sign_problem_tpu.io import load_ground_state

    cache = os.path.join(
        os.path.dirname(__file__), "..", "physical_systems", "data-small",
        f"{system}.h5",
    )
    config = systems.get_system(system)
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    psi, energy, _ = load_ground_state(cache)

    log_fn = ground_state_to_log_coeff_fn(psi, basis)
    model = make_ising_model(basis.states, op, log_psi_fn=log_fn)
    exact_bits = determine_exact_solution(basis.states, op, psi)
    x = solve_ising_model(model, mode="greedy")
    accuracy, overlap = compute_accuracy_and_overlap(x, exact_bits, psi**2)
    assert accuracy >= min_acc, (system, accuracy)
    assert overlap >= min_overlap, (system, overlap)


def test_estimate_betas_sk16_regression():
    """Pin the sk_16_1 annealing window (the hardest small instance,
    reference P(acc)=0.577 at 204800 sweeps): a schedule regression moves
    these endpoints and silently wrecks the convergence curves."""
    import os

    from annealing_sign_problem_tpu.io import load_ground_state
    from annealing_sign_problem_tpu.solvers import estimate_betas

    cache = os.path.join(
        os.path.dirname(__file__), "..", "physical_systems", "data-small",
        "sk_16_1.h5",
    )
    config = systems.get_system("sk_16_1")
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    psi, _, _ = load_ground_state(cache)
    model = make_ising_model(
        basis.states, op, log_psi_fn=ground_state_to_log_coeff_fn(psi, basis)
    )
    b0_lin, b1_lin = estimate_betas(model.ising_hamiltonian, schedule="linear")
    b0_geo, b1_geo = estimate_betas(model.ising_hamiltonian, schedule="geometric")
    # recorded from the validated engine (round 2); wide tolerances allow
    # ED-vector noise but not schedule-logic changes
    assert 0.05 < b0_geo < 5.0, b0_geo
    assert 1.0 < b0_lin < 100.0, b0_lin  # ln2/(4 max|J|), core scale
    assert b1_geo / b0_geo > 1e3 and b1_lin / b0_lin > 1e3
