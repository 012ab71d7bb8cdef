import numpy as np
import pytest

from annealing_sign_problem_tpu import bits, ed, systems
from annealing_sign_problem_tpu.amplitudes import (
    determine_exact_solution,
    ground_state_to_log_coeff_fn,
)
from annealing_sign_problem_tpu.basis import SpinBasis
from annealing_sign_problem_tpu.ising import (
    IsingHamiltonian,
    make_hamiltonian_extension,
    make_ising_model,
    sparsify_using_global_cutoff,
)
from annealing_sign_problem_tpu.operator import Operator, TermGroup


@pytest.fixture(scope="module")
def ring8():
    bonds = [[i, (i + 1) % 8] for i in range(8)]
    basis = SpinBasis(number_spins=8, hamming_weight=4).build()
    op = Operator(
        basis, [TermGroup(np.array(systems.heisenberg_matrix()), np.array(bonds))]
    )
    energy, psi = ed.ground_state(op, num_iter=64, seed=3)
    return op, energy, psi


def brute_force_ising_matrix(op, spins, psi_map):
    """Independent oracle: dense J_ij = H_ij |psi_i| |psi_j| over K."""
    n = len(spins)
    J = np.zeros((n, n))
    lookup = {int(s): i for i, s in enumerate(spins)}
    for i, s in enumerate(spins):
        nbrs, coeffs = op.apply(s)
        for t, c in zip(nbrs.tolist(), coeffs.tolist()):
            j = lookup.get(int(t))
            if j is not None:
                J[i, j] += c * abs(psi_map[int(s)]) * abs(psi_map[int(t)])
    return 0.5 * (J + J.T)


def test_full_basis_ising_energy_identity(ring8):
    """E(exact signs) must equal the quantum ground-state energy
    (full_hilbert_space.py:143-145 invariant)."""
    op, energy, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    exact_bits = determine_exact_solution(op.basis.states, op, psi)
    assert model.ising_hamiltonian.energy(exact_bits) == pytest.approx(energy, abs=1e-8)
    # x0 equals the exact solution when amplitudes come from the exact state
    np.testing.assert_array_equal(model.initial_signs, exact_bits)


def test_ising_matrix_matches_brute_force(ring8):
    op, _, psi = ring8
    rng = np.random.RandomState(0)
    subset = np.sort(
        rng.choice(op.basis.states, size=20, replace=False).astype(np.uint64)
    )
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(subset, op, log_psi_fn=log_fn)
    psi_map = {int(s): psi[op.basis.index(np.array([s]))[0]] for s in subset}
    # normalise the restricted psi the same way make_ising_model does
    norm = np.linalg.norm([psi_map[int(s)] for s in subset])
    psi_map = {k: v / norm for k, v in psi_map.items()}
    expected = brute_force_ising_matrix(op, subset, psi_map)
    got = model.ising_hamiltonian.exchange.toarray()
    np.testing.assert_allclose(got, expected, atol=1e-12)


def test_duplicate_spins_warn_and_dedupe(ring8):
    op, _, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    spins = np.concatenate([op.basis.states[:5], op.basis.states[:3]])
    model = make_ising_model(spins, op, log_psi_fn=log_fn)
    assert model.size == 5


def test_extension_grows_cluster(ring8):
    op, _, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    seed_spins = op.basis.states[:4]
    m0 = make_ising_model(seed_spins, op, log_psi_fn=log_fn)
    m1 = make_hamiltonian_extension(m0, log_fn)
    assert m1.size > m0.size
    # extension includes the original cluster
    assert np.all(np.isin(m0.spins, m1.spins))


def test_sparsify_keeps_frozen_component(ring8):
    op, _, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    seed_spins = op.basis.states[:6]
    m0 = make_ising_model(seed_spins, op, log_psi_fn=log_fn)
    m1 = make_hamiltonian_extension(m0, log_fn)
    m2 = sparsify_using_global_cutoff(m1, reltol=1e-2, frozen_spins=m0.spins)
    assert np.all(np.isin(m0.spins, m2.spins))
    assert m2.size <= m1.size
    # resulting graph is a single connected component
    from scipy.sparse.csgraph import connected_components

    ncomp, _ = connected_components(m2.ising_hamiltonian.exchange, directed=False)
    assert ncomp == 1


def test_hdf5_roundtrip(ring8, tmp_path):
    from annealing_sign_problem_tpu.ising import (
        dump_ising_model_to_hdf5,
        load_ising_model_from_hdf5,
    )

    op, energy, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    path = str(tmp_path / "fixture.h5")
    dump_ising_model_to_hdf5(model, psi, path)
    h, signs, e = load_ising_model_from_hdf5(path)
    assert e == pytest.approx(energy, abs=1e-8)
    assert h.energy(signs) == pytest.approx(energy, abs=1e-8)
    np.testing.assert_allclose(
        h.exchange.toarray(), model.ising_hamiltonian.exchange.toarray(), atol=1e-14
    )


def test_scale_field_contributions(ring8):
    """With scale_field=1 on a sub-cluster, E(x0) approximates the local
    energy including boundary terms."""
    op, _, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    subset = op.basis.states[:10]
    m_nofield = make_ising_model(subset, op, log_psi_fn=log_fn)
    m_field = make_ising_model(subset, op, log_psi_fn=log_fn, scale_field=1.0)
    assert np.allclose(m_nofield.ising_hamiltonian.field, 0.0)
    assert not np.allclose(m_field.ising_hamiltonian.field, 0.0)
    np.testing.assert_allclose(
        m_field.ising_hamiltonian.exchange.toarray(),
        m_nofield.ising_hamiltonian.exchange.toarray(),
    )
