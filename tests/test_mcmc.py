import numpy as np
import jax
import jax.numpy as jnp
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.basis import SpinBasis
from annealing_sign_problem_tpu.operator import Operator, TermGroup
from annealing_sign_problem_tpu.train.mcmc import (
    local_energy,
    metropolis_sample,
    table_log_amplitude_fn,
    zanella_sample,
)


@pytest.fixture(scope="module")
def ring():
    n = 8
    bonds = [[i, (i + 1) % n] for i in range(n)]
    basis = SpinBasis(number_spins=n, hamming_weight=4).build()
    op = Operator(
        basis, [TermGroup(np.array(systems.heisenberg_matrix()), np.array(bonds))]
    )
    energy, psi = ed.ground_state(op, num_iter=64, seed=3)
    return op, energy, psi


def empirical_distribution(samples, basis):
    flat = np.asarray(samples).reshape(-1)
    idx = basis.index(flat)
    counts = np.bincount(idx, minlength=basis.number_states)
    return counts / counts.sum()


def test_metropolis_matches_born_distribution(ring):
    op, _, psi = ring
    basis = op.basis
    log_amp = table_log_amplitude_fn(
        basis.states_device, jnp.asarray(np.log(np.abs(psi)))
    )
    C = 64
    x0 = jnp.asarray(np.asarray(basis.states)[np.random.RandomState(0).randint(0, basis.number_states, C)])
    samples, acc = metropolis_sample(
        log_amp, x0, jax.random.PRNGKey(0), number_spins=8,
        num_samples=800, sweep_size=4,
    )
    assert 0.05 < float(acc) <= 1.0
    p_emp = empirical_distribution(samples[200:], basis)
    p_true = psi**2
    # total-variation distance small
    tv = 0.5 * np.abs(p_emp - p_true).sum()
    assert tv < 0.08


def test_zanella_matches_born_distribution(ring):
    op, _, psi = ring
    basis = op.basis
    log_amp = table_log_amplitude_fn(
        basis.states_device, jnp.asarray(np.log(np.abs(psi)))
    )
    C = 64
    x0 = jnp.asarray(np.asarray(basis.states)[np.random.RandomState(1).randint(0, basis.number_states, C)])
    samples, weights = zanella_sample(
        log_amp, x0, jax.random.PRNGKey(1), number_spins=8, num_samples=600
    )
    samples, weights = np.asarray(samples[100:]), np.asarray(weights[100:])
    idx = basis.index(samples.reshape(-1))
    p_emp = np.bincount(idx, weights=weights.reshape(-1), minlength=basis.number_states)
    p_emp /= p_emp.sum()
    tv = 0.5 * np.abs(p_emp - psi**2).sum()
    assert tv < 0.08


def test_local_energy_ground_state(ring):
    """E_loc is constant (= E0) in the exact ground state."""
    op, energy, psi = ring
    basis = op.basis
    states = basis.states_device
    log_abs = jnp.asarray(np.log(np.abs(psi)))
    phase = jnp.asarray(np.where(psi >= 0, 0.0, np.pi))

    def log_psi_fn(spins):
        idx = jnp.clip(jnp.searchsorted(states, spins), 0, states.shape[0] - 1)
        return log_abs[idx] + 1j * phase[idx]

    e_loc = np.asarray(local_energy(op, log_psi_fn, states[:100]))
    np.testing.assert_allclose(e_loc.real, energy, atol=1e-6)
    np.testing.assert_allclose(e_loc.imag, 0.0, atol=1e-8)


def test_local_energy_wrong_signs_raises_energy(ring):
    """Destroying the signs must raise the (real part of the) energy —
    the sign problem in one assert."""
    op, energy, psi = ring
    basis = op.basis
    states = basis.states_device
    log_abs = jnp.asarray(np.log(np.abs(psi)))

    def log_psi_fn(spins):  # all-positive amplitudes
        idx = jnp.clip(jnp.searchsorted(states, spins), 0, states.shape[0] - 1)
        return log_abs[idx] + 0j

    weights = psi**2
    e_loc = np.asarray(local_energy(op, log_psi_fn, states)).real
    e_mean = float(np.dot(weights, e_loc))
    assert e_mean > energy + 0.5


def test_zanella_hamiltonian_moves_matches_born(ring):
    """H-connected move set (bond exchanges) must sample the same Born
    distribution as all-pairs moves — the ring's exchange bonds keep the
    chain irreducible in the hamming sector."""
    from annealing_sign_problem_tpu.train.mcmc import hamiltonian_moves

    op, _, psi = ring
    basis = op.basis
    moves = hamiltonian_moves(op)
    assert moves.shape == (8, 2)  # one move per ring bond
    log_amp = table_log_amplitude_fn(
        basis.states_device, jnp.asarray(np.log(np.abs(psi)))
    )
    C = 64
    x0 = jnp.asarray(
        np.asarray(basis.states)[np.random.RandomState(2).randint(0, basis.number_states, C)]
    )
    samples, weights = zanella_sample(
        log_amp, x0, jax.random.PRNGKey(2), number_spins=8, num_samples=600,
        moves=jnp.asarray(moves),
    )
    samples, weights = np.asarray(samples[100:]), np.asarray(weights[100:])
    idx = basis.index(samples.reshape(-1))
    p_emp = np.bincount(idx, weights=weights.reshape(-1), minlength=basis.number_states)
    p_emp /= p_emp.sum()
    tv = 0.5 * np.abs(p_emp - psi**2).sum()
    assert tv < 0.08
