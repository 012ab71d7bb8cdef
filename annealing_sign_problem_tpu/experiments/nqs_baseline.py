"""Variational-energy baseline with SA-projected signs (the
astrakhantsev_2021 pipeline).

Per Monte-Carlo sample: build the local Hamiltonian-neighbourhood cluster,
reconstruct signs on it (exact 'cheat' mode, or greedy/SA on the auxiliary
Ising model), and evaluate the local energy
E_loc(s) = sum c * psi(s')/psi(s). The weighted mean over Zanella samples
estimates the variational energy — the reference's ``establish_baseline``
(astrakhantsev_2021.py:613-702) with the external nqs_playground machinery
replaced by the in-framework samplers.

Also hosts ``is_frustrated`` — the graph-2-colorability check of the
sampled local Ising models (astrakhantsev_2021.py:432-476, `make
is_frustrated`), implemented with the parity union-find.
"""

from __future__ import annotations

import argparse
import sys
from typing import Callable, Optional

import numpy as np
import scipy.sparse

from .. import bits as _bits
from ..amplitudes import ground_state_to_log_coeff_fn
from ..ising import make_ising_model
from ..sampling import monte_carlo_sampling
from ..solvers import solve_ising_model
from ..utils.log import logger
from .common import add_system_arguments, load_system, resolve_ground_state


def create_cluster_for_local_energy(s0: int, hamiltonian) -> np.ndarray:
    """The H-neighbourhood of s0, sorted — the minimal cluster on which
    E_loc(s0) is computable (sampled_connected_components.py:440-446)."""
    xs, cs = hamiltonian.apply(np.uint64(s0))
    # s0 itself must be part of the cluster even when its diagonal element
    # vanishes (possible for Heisenberg states with balanced bonds)
    return np.unique(np.append(xs[cs != 0.0], np.uint64(s0)))


def extract_local_hamiltonian(hamiltonian, cluster: np.ndarray) -> scipy.sparse.csr_matrix:
    """The quantum Hamiltonian restricted to a cluster of basis states —
    <s_i|H|s_j> for s_i, s_j in the cluster (the reference's
    slice_coo_matrix/extract_local_hamiltonian pair,
    astrakhantsev_2021.py:401-429)."""
    import jax.numpy as jnp

    cluster = np.unique(_bits.spins_to_array(cluster))
    n = len(cluster)
    nbrs, coeffs = hamiltonian.apply_padded(jnp.asarray(cluster))
    nbrs, coeffs = np.asarray(nbrs), np.asarray(coeffs)
    idx = np.clip(np.searchsorted(cluster, nbrs), 0, n - 1)
    member = cluster[idx] == nbrs
    rows = np.repeat(np.arange(n), nbrs.shape[1])
    data = np.where(member, coeffs, 0.0).reshape(-1)
    m = scipy.sparse.coo_matrix(
        (data, (rows, idx.reshape(-1))), shape=(n, n)
    ).tocsr()
    m.sum_duplicates()
    m.eliminate_zeros()
    return m


def is_frustrated(exchange: scipy.sparse.spmatrix) -> bool:
    """True iff the Ising model's couplings cannot all be satisfied — a
    parity-consistency (signed 2-coloring) check via union-find
    (astrakhantsev_2021.py:432-476)."""
    coo = exchange.tocoo()
    mask = (coo.row < coo.col) & (coo.data != 0.0)
    rows, cols, vals = coo.row[mask], coo.col[mask], coo.data[mask]
    n = exchange.shape[0]
    parent = np.arange(n)
    parity = np.zeros(n, dtype=np.uint8)

    def find(i):
        path, p = [], 0
        while parent[i] != i:
            path.append(i)
            p ^= parity[i]
            i = parent[i]
        acc = p
        for node in path:
            old = parity[node]
            parent[node] = i
            parity[node] = acc
            acc ^= old
        return i, p

    for i, j, w in zip(rows, cols, vals):
        want = 1 if w > 0 else 0
        ri, pi = find(i)
        rj, pj = find(j)
        if ri == rj:
            if pi ^ pj != want:
                return True
        else:
            parent[rj] = ri
            parity[rj] = pi ^ pj ^ want
    return False


def compute_local_energy_for_sample(
    s0: int,
    hamiltonian,
    log_coeff_fn: Callable,
    ground_state: Optional[np.ndarray] = None,
    mode: str = "greedy",
    number_sweeps: int = 5000,
    repetitions: int = 64,
    seed: int = 0,
) -> complex:
    """E_loc(s0) with cluster signs from the sign-reconstruction pipeline
    (sampled_connected_components.py:294-359). mode: 'cheat' uses exact
    signs; 'greedy'/'sa' reconstruct them on the local cluster."""
    cluster = create_cluster_for_local_energy(s0, hamiltonian)
    if mode == "cheat":
        if ground_state is None:
            raise ValueError("cheat mode needs the exact ground state")
        signs = np.sign(ground_state[hamiltonian.basis.index(cluster)])
    else:
        model = make_ising_model(cluster, hamiltonian, log_psi_fn=log_coeff_fn)
        x = solve_ising_model(
            model, mode=mode, seed=seed,
            number_sweeps=number_sweeps, repetitions=repetitions,
            bucket=True,  # bounded kernel-shape set across the sample stream
        )
        signs = _bits.bits_to_signs(x, model.size)
        # gauge-fix against the amplitude oracle's own signs so independent
        # clusters share a convention
        x0_signs = _bits.bits_to_signs(model.initial_signs, model.size)
        if np.mean(signs == x0_signs) < 0.5:
            signs = -signs

    nbrs, coeffs = hamiltonian.apply(np.uint64(s0))
    sel = coeffs != 0.0
    nbrs, coeffs = nbrs[sel], coeffs[sel]
    log0 = complex(log_coeff_fn(np.array([s0], dtype=np.uint64))[0])
    logn = np.asarray(log_coeff_fn(nbrs))

    lookup = np.searchsorted(cluster, nbrs)
    sign_n = signs[lookup]
    sign_0 = signs[np.searchsorted(cluster, np.uint64(s0))]
    amp_ratio = np.exp(logn.real - log0.real)
    return complex(np.sum(coeffs * amp_ratio * sign_n / sign_0))


def _network_amplitude_oracle(op, psi, args, rng):
    """Train a log-amplitude network on the ground state and return
    (host log-coeff fn, Zanella sampler fn) backed by the network.

    Replaces the reference's pretrained-PRX-checkpoint amplitude source
    (astrakhantsev_2021.py:260-285) with an in-framework pre-training step;
    sampling runs Zanella chains on the *network's* |psi|^2 with
    H-connected moves (astrakhantsev_2021.py:288-345 `sample_some`
    mode='zanella'), not i.i.d. draws from the ED vector.
    """
    import jax
    import jax.numpy as jnp

    from ..models.nqs import (
        LogAmplitudeConv3D,
        LogAmplitudeMLP,
        pretrain_amplitude,
        pyrochlore_translations,
        symmetrize_log_amplitude,
    )
    from ..train.mcmc import hamiltonian_moves, zanella_sample

    basis = op.basis
    n = basis.number_spins
    if args.model == "cnn":
        if n != 32:
            raise ValueError("the 3D-CNN amplitude net is the 32-site "
                             "pyrochlore layout (2x2x2 cells x 4 sublattices)")
        model = LogAmplitudeConv3D(channels=(args.width // 4,) * args.depth)
    else:
        model = LogAmplitudeMLP(number_spins=n, features=(args.width,) * args.depth)
    log_amps = np.log(np.maximum(np.abs(psi), 1e-300))
    params, loss = pretrain_amplitude(
        model, basis.states, log_amps,
        steps=args.pretrain_steps, seed=args.seed,
    )
    logger.info("amplitude network pre-trained: weighted MSE = {:.3e}", loss)

    raw_apply = lambda s: model.apply(params, s)
    if args.symmetrize:
        # amplitude symmetrisation over the 2x2x2 cell translations
        # (astrakhantsev_2021.py:210-254 combine_*_all_2x2x2)
        net_apply = symmetrize_log_amplitude(
            raw_apply, pyrochlore_translations(), n
        )
        logger.info("amplitude net symmetrised over 8 cell translations")
    else:
        net_apply = raw_apply

    def log_fn(spins):
        spins = np.asarray(spins, dtype=np.uint64)
        a = np.asarray(net_apply(jnp.asarray(spins)), dtype=np.float64)
        return a.astype(np.complex128)

    moves = jnp.asarray(hamiltonian_moves(op))

    def sample(number_samples):
        chains = min(32, number_samples)
        steps = (number_samples + chains - 1) // chains
        # burn-in from |psi|^2-weighted seeds keeps thermalisation short
        x0 = np.random.RandomState(args.seed).choice(
            basis.states, size=chains, p=np.abs(psi) ** 2 / np.sum(np.abs(psi) ** 2)
        )
        samples, weights = zanella_sample(
            net_apply,
            jnp.asarray(x0.astype(np.uint64)),
            jax.random.PRNGKey(args.seed + 1),
            number_spins=n,
            num_samples=steps + args.burn_in,
            moves=moves,
        )
        samples = np.asarray(samples[args.burn_in :]).reshape(-1)[:number_samples]
        weights = np.asarray(weights[args.burn_in :]).reshape(-1)[:number_samples]
        return samples, weights

    return log_fn, sample


def establish_baseline(argv=None):
    parser = argparse.ArgumentParser(
        description="Variational energy with SA-projected signs (NQS baseline)."
    )
    add_system_arguments(parser)
    parser.add_argument("--number-samples", type=int, default=200)
    parser.add_argument("--mode", choices=["cheat", "greedy", "sa"], default="greedy")
    parser.add_argument("--amplitude-source", choices=["ed", "network"], default="ed",
                        help="'ed': exact amplitudes, i.i.d. sampling; 'network': "
                             "pre-trained log-amplitude net with Zanella sampling")
    parser.add_argument("--sampled-power", type=float, default=2.0)
    parser.add_argument("--number-sweeps", type=int, default=5000)
    parser.add_argument("--repetitions", type=int, default=64)
    parser.add_argument("--pretrain-steps", type=int, default=2000)
    parser.add_argument("--width", type=int, default=96)
    parser.add_argument("--depth", type=int, default=2)
    parser.add_argument("--model", choices=["mlp", "cnn"], default="mlp",
                        help="'cnn': periodic 3D conv net on the 2x2x2x4 "
                             "pyrochlore layout (astrakhantsev_2021's CNN)")
    parser.add_argument("--symmetrize", action="store_true",
                        help="logmeanexp-symmetrise amplitudes over the "
                             "eight pyrochlore cell translations")
    parser.add_argument("--burn-in", type=int, default=50)
    parser.add_argument("--seed", type=int, default=12345)
    args = parser.parse_args(argv)

    op, name = load_system(args)
    psi, energy = resolve_ground_state(op, name, args.hdf5)
    psi = psi / np.linalg.norm(psi)

    rng = np.random.RandomState(args.seed)
    if args.amplitude_source == "network":
        log_fn, sample = _network_amplitude_oracle(op, psi, args, rng)
        spins, weights = sample(args.number_samples)
    else:
        log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
        sampling = monte_carlo_sampling(
            op.basis.states, psi, args.number_samples,
            sampled_power=args.sampled_power, rng=rng,
        )
        spins = sampling.spins
        weights = np.ones(len(spins))

    energies = []
    for k, s in enumerate(spins):
        energies.append(
            compute_local_energy_for_sample(
                int(s), op, log_fn, ground_state=psi, mode=args.mode,
                number_sweeps=args.number_sweeps, repetitions=args.repetitions,
                seed=int(rng.randint(1 << 31)),
            )
        )
        if (k + 1) % 8 == 0 or k + 1 == len(spins):
            running = float(np.mean(np.real(energies)))
            logger.info(
                "local energies: {}/{} (running mean {})",
                k + 1, len(spins), running,
            )
    energies = np.array(energies)
    weights = weights / weights.sum()
    mean = float(np.sum(weights * energies.real))
    var = float(np.sum(weights * (energies.real - mean) ** 2))
    err = np.sqrt(var / len(energies))
    logger.info(
        "local-energy estimate: {} ± {} (exact: {})", mean, err, energy
    )
    print(f"{mean},{err},{energy}")
    return 0


if __name__ == "__main__":
    sys.exit(establish_baseline())
