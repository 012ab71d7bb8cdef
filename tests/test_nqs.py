import numpy as np
import jax
import jax.numpy as jnp
import pytest
import scipy.sparse

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.amplitudes import ground_state_to_log_coeff_fn
from annealing_sign_problem_tpu.basis import SpinBasis
from annealing_sign_problem_tpu.experiments.nqs_baseline import (
    compute_local_energy_for_sample,
    create_cluster_for_local_energy,
    establish_baseline,
    is_frustrated,
)
from annealing_sign_problem_tpu.models.nqs import (
    LogAmplitudeConv3D,
    LogAmplitudeMLP,
    logmeanexp,
    project_to_real,
    pyrochlore_translations,
    symmetrize_log_amplitude,
)
from annealing_sign_problem_tpu.operator import Operator, TermGroup


def test_logmeanexp():
    x = jnp.asarray(np.log([1.0, 3.0]))
    assert float(logmeanexp(x)) == pytest.approx(np.log(2.0))


def test_project_to_real():
    z = jnp.asarray([0.5 + 0.1j, 0.3 + 3.0j])
    out = np.asarray(project_to_real(z))
    np.testing.assert_allclose(out.imag, [0.0, np.pi])


def test_amplitude_mlp_and_symmetrization():
    model = LogAmplitudeMLP(number_spins=32, features=(16,))
    spins = jnp.asarray(np.random.RandomState(0).randint(0, 1 << 31, 8).astype(np.uint64))
    params = model.init(jax.random.PRNGKey(0), spins)

    def log_amp(s):
        return model.apply(params, s)

    perms = pyrochlore_translations()
    assert perms.shape == (8, 32)
    sym = symmetrize_log_amplitude(log_amp, perms, 32)
    out = sym(spins)
    assert out.shape == (8,)
    # symmetrised amplitude is invariant under any of the translations
    shift = jnp.asarray(np.uint64(1) << perms[3].astype(np.uint64))
    shifts = jnp.arange(32, dtype=jnp.uint64)
    bit = ((spins[:, None] >> shifts) & jnp.uint64(1)).astype(jnp.uint64)
    images = jnp.sum(bit * shift, axis=-1)
    np.testing.assert_allclose(np.asarray(sym(images)), np.asarray(out), rtol=1e-5)


def test_amplitude_conv3d():
    model = LogAmplitudeConv3D(channels=(4,))
    spins = jnp.asarray(np.arange(5, dtype=np.uint64))
    params = model.init(jax.random.PRNGKey(0), spins)
    out = model.apply(params, spins)
    assert out.shape == (5,)


def test_is_frustrated():
    # triangle with all-antiferromagnetic couplings: frustrated
    tri = scipy.sparse.coo_matrix(
        ([1.0, 1.0, 1.0], ([0, 1, 2], [1, 2, 0])), shape=(3, 3)
    )
    tri = 0.5 * (tri + tri.T)
    assert is_frustrated(tri)
    # chain: not frustrated
    chain = scipy.sparse.coo_matrix(([1.0, 1.0], ([0, 1], [1, 2])), shape=(3, 3))
    chain = 0.5 * (chain + chain.T)
    assert not is_frustrated(chain)


@pytest.fixture(scope="module")
def kagome16():
    config = systems.get_system("heisenberg_kagome_16")
    from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config

    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    energy, psi = ed.ground_state(op, num_iter=64, seed=0)
    return op, energy, psi


def test_local_energy_cluster_estimator(kagome16):
    """With exact amplitudes and greedy-reconstructed cluster signs, the
    weighted local-energy average approaches E0."""
    op, energy, psi = kagome16
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    rng = np.random.RandomState(0)
    p = psi**2
    p /= p.sum()
    idx = rng.choice(op.basis.number_states, size=40, replace=True, p=p)
    energies = np.array(
        [
            compute_local_energy_for_sample(int(s), op, log_fn, mode="greedy")
            for s in op.basis.states[idx]
        ]
    )
    assert np.allclose(energies.imag, 0.0, atol=1e-9)
    assert abs(energies.real.mean() - energy) < 1.0


def test_local_energy_cheat_is_exact(kagome16):
    op, energy, psi = kagome16
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    s0 = int(op.basis.states[1234])
    e = compute_local_energy_for_sample(s0, op, log_fn, ground_state=psi, mode="cheat")
    assert e.real == pytest.approx(energy, abs=1e-6)


def test_extract_local_hamiltonian(kagome16):
    from annealing_sign_problem_tpu.experiments.nqs_baseline import (
        extract_local_hamiltonian,
    )

    op, _, psi = kagome16
    cluster = op.basis.states[:15]
    m = extract_local_hamiltonian(op, cluster)
    assert m.shape == (15, 15)
    assert abs(m - m.T).max() < 1e-12
    # entries agree with direct apply
    nbrs, coeffs = op.apply(cluster[0])
    for t, c in zip(nbrs.tolist(), coeffs.tolist()):
        j = np.searchsorted(cluster, np.uint64(t))
        if j < 15 and cluster[j] == np.uint64(t):
            assert m[0, j] == pytest.approx(c)


def test_nqs_baseline_network_amplitudes(kagome16, tmp_path, monkeypatch):
    """--amplitude-source network: pre-trained amplitude net + Zanella
    sampling must reproduce the ED-oracle local-energy estimate within
    error bars (VERDICT: the reference pipeline samples from the network,
    astrakhantsev_2021.py:288-345,613-702)."""
    from annealing_sign_problem_tpu.experiments import nqs_baseline

    op, energy, psi = kagome16
    import annealing_sign_problem_tpu.experiments.common as common

    monkeypatch.setattr(common, "load_system", lambda args: (op, "kagome16"))
    monkeypatch.setattr(
        common, "resolve_ground_state", lambda op_, name, h5: (psi, energy)
    )
    monkeypatch.setattr(nqs_baseline, "load_system", common.load_system)
    monkeypatch.setattr(nqs_baseline, "resolve_ground_state", common.resolve_ground_state)

    import io
    from contextlib import redirect_stdout

    out = io.StringIO()
    with redirect_stdout(out):
        nqs_baseline.establish_baseline([
            "--system", "unused", "--number-samples", "40",
            "--mode", "cheat", "--amplitude-source", "network",
            "--pretrain-steps", "600", "--burn-in", "30", "--seed", "7",
        ])
    mean, err, exact = map(float, out.getvalue().strip().split(","))
    # cheat signs + network amplitudes: the residual error is the
    # amplitude-network fit; demand agreement with E0 at the few-percent level
    assert abs(mean - exact) < max(5 * err, 0.05 * abs(exact))
