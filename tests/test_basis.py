import numpy as np
import pytest
from scipy.special import comb

from annealing_sign_problem_tpu.basis import (
    SpinBasis,
    Symmetry,
    enumerate_fixed_hamming,
)


def test_enumerate_fixed_hamming_counts():
    for n, k in [(4, 2), (10, 5), (16, 8), (18, 9)]:
        states = enumerate_fixed_hamming(n, k)
        assert states.shape[0] == comb(n, k, exact=True)
        assert np.all(np.diff(states.astype(np.int64)) > 0)  # sorted, unique
        pop = np.array([bin(int(s)).count("1") for s in states])
        assert np.all(pop == k)


def test_basis_no_symmetry_index():
    basis = SpinBasis(number_spins=6, hamming_weight=3).build()
    assert basis.number_states == 20
    idx = basis.index(basis.states[[3, 7, 19]])
    np.testing.assert_array_equal(idx, [3, 7, 19])
    with pytest.raises(KeyError):
        basis.index(np.array([0], dtype=np.uint64))  # hamming weight 0


def test_spin_inversion_basis():
    # n=4, k=2: 6 states; inversion pairs (0011,1100),(0101,1010),(0110,1001)
    basis = SpinBasis(number_spins=4, hamming_weight=2, spin_inversion=1).build()
    assert basis.number_states == 3
    np.testing.assert_array_equal(basis.states, [0b0011, 0b0101, 0b0110])
    rep, chi = basis.state_info(np.array([0b1100, 0b0101], dtype=np.uint64))
    np.testing.assert_array_equal(rep, [0b0011, 0b0101])
    np.testing.assert_array_equal(chi, [1.0, 1.0])


def test_spin_inversion_odd_sector():
    basis = SpinBasis(number_spins=4, hamming_weight=2, spin_inversion=-1).build()
    assert basis.number_states == 3
    rep, chi = basis.state_info(np.array([0b1100], dtype=np.uint64))
    np.testing.assert_array_equal(rep, [0b0011])
    np.testing.assert_array_equal(chi, [-1.0])


def test_translation_symmetry_ring():
    # 4-site ring translation, sector 0: orbits of the C(4,2)=6 states are
    # {0011,0110,1100,1001} and {0101,1010} -> 2 representatives
    perm = (1, 2, 3, 0)
    basis = SpinBasis(
        number_spins=4, hamming_weight=2, symmetries=[Symmetry(perm, 0)]
    ).build()
    assert basis.number_states == 2
    np.testing.assert_array_equal(basis.states, [0b0011, 0b0101])
    # norms: |stab| = 1 for 0011-orbit (4 distinct images), 2 for 0101
    np.testing.assert_allclose(basis.norms, [1.0, 2.0])


def test_state_info_device_matches_host():
    perm = (1, 2, 3, 0)
    basis = SpinBasis(
        number_spins=4, hamming_weight=2, symmetries=[Symmetry(perm, 0)],
        spin_inversion=1,
    ).build()
    import jax.numpy as jnp

    all_states = enumerate_fixed_hamming(4, 2)
    rep_h, chi_h = basis.state_info(all_states)
    rep_d, chi_d = basis.state_info_device(jnp.asarray(all_states))
    np.testing.assert_array_equal(np.asarray(rep_d), rep_h)
    np.testing.assert_allclose(np.asarray(chi_d), chi_h)


def test_build_from_representatives():
    basis = SpinBasis(number_spins=6, hamming_weight=3)
    full = enumerate_fixed_hamming(6, 3)
    basis.build(representatives=full)
    assert basis.number_states == 20
