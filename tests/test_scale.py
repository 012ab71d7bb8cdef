"""Large-scale machinery validated against the small-scale paths."""

import numpy as np
import jax.numpy as jnp
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.basis import SpinBasis, Symmetry, enumerate_fixed_hamming
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.scale import (
    build_basis_at_scale,
    enumerate_representatives,
    ground_state_large,
)


def test_matmul_images_match_host():
    basis = SpinBasis(
        number_spins=18, hamming_weight=9, spin_inversion=1,
        symmetries=[Symmetry(tuple((np.arange(18) + 2) % 18), 0)],
    )
    states = enumerate_fixed_hamming(18, 9)[:500]
    rep_h, chi_h = basis.state_info(states)
    rep_d, chi_d = basis.state_info_device(jnp.asarray(states))
    np.testing.assert_array_equal(np.asarray(rep_d), rep_h)
    np.testing.assert_allclose(np.asarray(chi_d), chi_h)


def test_enumeration_matches_build_kagome18():
    config = systems.get_system("heisenberg_kagome_18")
    basis_ref = basis_from_config(config).build()
    basis_dev = basis_from_config(config)
    reps, stabs = enumerate_representatives(basis_dev, hi_batch=64)
    np.testing.assert_array_equal(reps, basis_ref.states)
    np.testing.assert_allclose(stabs, basis_ref.norms)


def test_enumeration_with_translations():
    perm = tuple((np.arange(8) + 1) % 8)
    basis_ref = SpinBasis(
        number_spins=8, hamming_weight=4, symmetries=[Symmetry(perm, 0)]
    ).build()
    basis_dev = SpinBasis(
        number_spins=8, hamming_weight=4, symmetries=[Symmetry(perm, 0)]
    )
    reps, stabs = enumerate_representatives(basis_dev, hi_batch=16)
    np.testing.assert_array_equal(reps, basis_ref.states)
    np.testing.assert_allclose(stabs, basis_ref.norms)


def test_ground_state_large_matches_small():
    config = systems.get_system("heisenberg_kagome_18")
    basis = basis_from_config(config)
    build_basis_at_scale(basis, hi_batch=256)
    op = operator_from_config(config, basis)
    e_large, psi_large = ground_state_large(
        op, num_iter=48, restarts=6, chunk_size=4096, dtype=jnp.float64,
    )
    e_small, psi_small = ed.ground_state(op, num_iter=96, seed=0)
    assert e_large == pytest.approx(e_small, abs=1e-7)
    assert abs(np.dot(psi_large, psi_small)) == pytest.approx(1.0, abs=1e-7)


def test_ground_state_codebook_matches_small():
    from annealing_sign_problem_tpu.scale import ground_state_codebook

    config = systems.get_system("heisenberg_kagome_18")
    basis = basis_from_config(config)
    build_basis_at_scale(basis, hi_batch=256)
    op = operator_from_config(config, basis)
    e_cb, psi_cb = ground_state_codebook(
        op, num_iter=48, restarts=6, chunk_size=1024, super_chunks=4,
        polish_restarts=2, polish_iter=24,
    )
    e_ref, psi_ref = ed.ground_state(op, num_iter=96, seed=0)
    assert e_cb == pytest.approx(e_ref, abs=1e-7)
    assert abs(np.dot(psi_cb, psi_ref)) == pytest.approx(1.0, abs=1e-6)
