"""Symmetry-adapted end-to-end validation: kagome-18 in the reference's
spin-inversion sector (heisenberg_kagome_18.yaml:4) and a
translation-symmetric sector, both against independent oracles."""

import numpy as np
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.amplitudes import (
    determine_exact_solution,
    ground_state_to_log_coeff_fn,
)
from annealing_sign_problem_tpu.basis import SpinBasis, Symmetry
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.ising import make_ising_model
from annealing_sign_problem_tpu.metrics import compute_accuracy_and_overlap
from annealing_sign_problem_tpu.operator import Operator, TermGroup
from annealing_sign_problem_tpu.solvers import solve_ising_model


def test_kagome18_sector_dimension():
    config = systems.get_system("heisenberg_kagome_18")
    basis = basis_from_config(config).build()
    # C(18,9)/2 — no inversion-fixed states at half filling
    assert basis.number_states == 24310


@pytest.mark.slow
def test_kagome18_end_to_end():
    """ED in the symmetry sector + full-basis greedy sign reconstruction."""
    config = systems.get_system("heisenberg_kagome_18")
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    energy, psi = ed.ground_state(op, num_iter=96, seed=0)

    # cross-check: symmetric-sector ground energy must match the energy in
    # the unsymmetrised hamming basis (kagome-18's ground state is in the
    # +1 inversion sector — that's why the reference pins spin_inversion=1)
    config_full = dict(config)
    config_full = systems.get_system("heisenberg_kagome_18")
    config_full["basis"]["spin_inversion"] = None
    basis_full = basis_from_config(config_full).build()
    op_full = operator_from_config(config_full, basis_full)
    energy_full, _ = ed.ground_state(op_full, num_iter=96, seed=0)
    assert energy == pytest.approx(energy_full, abs=1e-7)

    log_fn = ground_state_to_log_coeff_fn(psi, basis)
    model = make_ising_model(basis.states, op, log_psi_fn=log_fn)
    exact = determine_exact_solution(basis.states, op, psi)
    assert model.ising_hamiltonian.energy(exact) == pytest.approx(energy, abs=1e-7)

    x = solve_ising_model(model, mode="greedy")
    accuracy, overlap = compute_accuracy_and_overlap(x, exact, psi**2)
    assert overlap > 0.95


def test_translation_sector_operator_eigenvalues():
    """8-site ring with full translation symmetry: sector-0 spectrum is a
    subset of the full spectrum and contains the ground state."""
    n = 8
    bonds = [[i, (i + 1) % n] for i in range(n)]
    matrix = np.array(systems.heisenberg_matrix())
    perm = tuple((np.arange(n) + 1) % n)
    sym_basis = SpinBasis(
        number_spins=n, hamming_weight=4, symmetries=[Symmetry(perm, 0)]
    ).build()
    full_basis = SpinBasis(number_spins=n, hamming_weight=4).build()
    op_sym = Operator(sym_basis, [TermGroup(matrix, np.array(bonds))])
    op_full = Operator(full_basis, [TermGroup(matrix, np.array(bonds))])

    # NOTE: with nontrivial stabilisers the sector matrix needs the
    # sqrt(n_r'/n_r) norm factors
    import jax.numpy as jnp
    import scipy.sparse

    nbrs, coeffs = op_sym.apply_padded_normalised(jnp.asarray(sym_basis.states))
    nbrs, coeffs = np.asarray(nbrs), np.asarray(coeffs)
    K = sym_basis.number_states
    idx = np.searchsorted(sym_basis.states, nbrs)
    idx = np.clip(idx, 0, K - 1)
    member = sym_basis.states[idx] == nbrs
    rows = np.repeat(np.arange(K), nbrs.shape[1])
    m = scipy.sparse.coo_matrix(
        (np.where(member, coeffs, 0.0).reshape(-1), (rows, idx.reshape(-1))),
        shape=(K, K),
    ).toarray()
    e_sym = np.linalg.eigvalsh(m)
    e_full = np.linalg.eigvalsh(op_full.to_scipy_sparse().toarray())
    assert e_sym[0] == pytest.approx(e_full[0], abs=1e-9)
    for e in e_sym:
        assert np.min(np.abs(e_full - e)) < 1e-7
