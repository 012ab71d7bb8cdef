import numpy as np
import jax.numpy as jnp
import pytest

from annealing_sign_problem_tpu import systems
from annealing_sign_problem_tpu.basis import SpinBasis
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.operator import Operator, TermGroup


def heisenberg_chain(n, periodic=True):
    bonds = [[i, (i + 1) % n] for i in range(n if periodic else n - 1)]
    basis = SpinBasis(number_spins=n, hamming_weight=n // 2).build()
    matrix = np.array(systems.heisenberg_matrix(1.0))
    return Operator(basis, [TermGroup(matrix, np.array(bonds))])


def dense_heisenberg(n, bonds):
    """Direct dense Hamiltonian in the full 2^n space, restricted to the
    hamming sector — an independent oracle for the operator engine."""
    dim = 1 << n
    H = np.zeros((dim, dim))
    for (i, j) in bonds:
        for s in range(dim):
            bi, bj = (s >> i) & 1, (s >> j) & 1
            H[s, s] += 1.0 if bi == bj else -1.0  # sz.sz (Pauli units)
            if bi != bj:
                H[s ^ ((1 << i) | (1 << j)), s] += 2.0
    return H


def test_apply_matches_dense_chain():
    n = 6
    bonds = [[i, (i + 1) % n] for i in range(n)]
    op = heisenberg_chain(n)
    H = dense_heisenberg(n, bonds)
    states = op.basis.states
    for s in states[[0, 3, 11]]:
        nbrs, coeffs = op.apply(s)
        dense_row = H[:, int(s)]
        expected = {int(t): dense_row[int(t)] for t in np.nonzero(dense_row)[0]}
        got = {}
        for t, c in zip(nbrs.tolist(), coeffs.tolist()):
            got[int(t)] = got.get(int(t), 0.0) + c
        assert set(got) == set(expected)
        for t in got:
            assert got[t] == pytest.approx(expected[t])


def test_matvec_matches_scipy():
    op = heisenberg_chain(8)
    K = op.basis.number_states
    rng = np.random.RandomState(0)
    x = rng.standard_normal(K)
    y = np.asarray(op.matvec(jnp.asarray(x)))
    m = op.to_scipy_sparse()
    np.testing.assert_allclose(y, m @ x, rtol=1e-12)
    # symmetry of the matrix
    assert abs(m - m.T).max() < 1e-12


def test_heisenberg_chain_ground_energy():
    # 8-site periodic Heisenberg chain: E0/J = -2*... known from Bethe ansatz
    # tables; we cross-check against dense diagonalisation instead.
    n = 8
    bonds = [[i, (i + 1) % n] for i in range(n)]
    op = heisenberg_chain(n)
    m = op.to_scipy_sparse().toarray()
    e_sector = np.linalg.eigvalsh(m)[0]
    H = dense_heisenberg(n, bonds)
    e_full = np.linalg.eigvalsh(H)[0]
    assert e_sector == pytest.approx(e_full, abs=1e-10)


def test_sk_instance_reproducible():
    inst = systems.sk_instances()
    # deterministic: same stream twice
    inst2 = systems.sk_instances()
    a = inst["sk_32_1"]["hamiltonian"]["terms"][0]["matrix"]
    b = inst2["sk_32_1"]["hamiltonian"]["terms"][0]["matrix"]
    assert a == b
    assert len(inst["sk_16_1"]["hamiltonian"]["terms"]) == 120
    assert len(inst["sk_32_1"]["hamiltonian"]["terms"]) == 496


def test_spin_inversion_operator_consistency():
    """H in the spin-inversion-adapted basis must reproduce the sector
    eigenvalues of the full hamming basis (kagome-18 uses this sector)."""
    config = systems.heisenberg_kagome_16()
    # shrink: use a 6-site ring with inversion instead for speed
    bonds = [[i, (i + 1) % 6] for i in range(6)]
    full_basis = SpinBasis(number_spins=6, hamming_weight=3).build()
    sym_basis = SpinBasis(number_spins=6, hamming_weight=3, spin_inversion=1).build()
    matrix = np.array(systems.heisenberg_matrix(1.0))
    anti_basis = SpinBasis(number_spins=6, hamming_weight=3, spin_inversion=-1).build()
    op_full = Operator(full_basis, [TermGroup(matrix, np.array(bonds))])
    op_sym = Operator(sym_basis, [TermGroup(matrix, np.array(bonds))])
    op_anti = Operator(anti_basis, [TermGroup(matrix, np.array(bonds))])
    e_full = np.linalg.eigvalsh(op_full.to_scipy_sparse().toarray())
    e_sym = np.linalg.eigvalsh(op_sym.to_scipy_sparse().toarray())
    e_anti = np.linalg.eigvalsh(op_anti.to_scipy_sparse().toarray())
    # the two sectors partition the full spectrum
    np.testing.assert_allclose(
        np.sort(np.concatenate([e_sym, e_anti])), e_full, atol=1e-8
    )
    for e in e_sym:
        assert np.min(np.abs(e_full - e)) < 1e-8


def test_systems_yaml_roundtrip(tmp_path):
    from annealing_sign_problem_tpu.io import config_to_yaml, load_hamiltonian

    config = systems.j1j2_square(4, 4, 0.55)
    path = tmp_path / "j1j2.yaml"
    config_to_yaml(config, str(path))
    op = load_hamiltonian(str(path))
    assert op.basis.number_spins == 16
    assert op.number_pairs == 64
