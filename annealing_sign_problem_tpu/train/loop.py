"""The SA <-> NN self-training loop.

Re-design of the reference gen-2 pipeline (``find_ground_state``,
train.py:461-555): amplitudes come from ED, phases from the sign network;
Monte-Carlo-sampled spin subsets get their signs optimised by the TPU
annealer on the auxiliary Ising model; the network is then trained
supervised on those signs; repeat. Metrics are evaluated on the full
Hilbert space (train.py:1216-1240).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import numpy as np

from .. import bits as _bits
from ..amplitudes import ground_state_to_log_coeff_fn
from ..ising import make_ising_model
from ..operator import Operator
from ..solvers import anneal
from ..utils.log import logger
from .supervised import SignModelState, forward_logits, tune_neural_network

__all__ = [
    "TrainingConfig",
    "model_log_coeff_fn",
    "optimize_sign_structure",
    "tune_sign_structure",
    "compute_metrics_on_full_space",
    "find_ground_state",
    "make_deterministic",
]


@dataclasses.dataclass
class TrainingConfig:
    """Hyperparameters of the outer loop (the reference's Config namedtuple,
    train.py:334-350)."""

    number_sa_sweeps: int = 10000
    number_supervised_epochs: int = 300
    number_monte_carlo_samples: int = 5000
    number_outer_iterations: int = 4
    train_batch_size: int = 256
    sampled_power: float = 2.0
    sa_repetitions: int = 64
    output: Optional[str] = None
    seed: int = 12345
    scale_field: Optional[Sequence[Optional[float]]] = None  # per-iteration
    sa_engine: str = "auto"  # solvers.sa.anneal engine override
    # estimate full-space metrics from this many sampled states instead of
    # evaluating the network on every basis state (None = exact). Needed
    # when the basis is huge and the evaluation budget is not (a kagome-36
    # full-space pass is 31.5M forward evaluations).
    metrics_subsample: Optional[int] = None


def _check_resume_fingerprint(config: "TrainingConfig") -> None:
    """Resume artifacts (sa_dataset_{i}.h5, model_{i}) are keyed only by
    path; silently reusing them after the seed / sampling / SA settings
    changed would mix configs. Write a fingerprint next to the caches on
    first run and REFUSE to resume on mismatch (ADVICE r4)."""
    import json

    fp = {
        "seed": config.seed,
        "number_sa_sweeps": config.number_sa_sweeps,
        "number_supervised_epochs": config.number_supervised_epochs,
        "number_monte_carlo_samples": config.number_monte_carlo_samples,
        "number_outer_iterations": config.number_outer_iterations,
        "train_batch_size": config.train_batch_size,
        "sampled_power": config.sampled_power,
        "sa_repetitions": config.sa_repetitions,
        "scale_field": list(config.scale_field) if config.scale_field is not None else None,
    }
    path = os.path.join(config.output, "config_fingerprint.json")
    if os.path.exists(path):
        with open(path) as f:
            old = json.load(f)
        if old != fp:
            diff = {k: (old.get(k), v) for k, v in fp.items() if old.get(k) != v}
            raise RuntimeError(
                f"refusing to resume into {config.output}: cached artifacts "
                f"were built under a different config (old, new): {diff}. "
                "Use a fresh output directory or delete the stale caches."
            )
        return
    os.makedirs(config.output, exist_ok=True)
    with open(path, "w") as f:
        json.dump(fp, f, indent=1)


def make_deterministic(seed: Optional[int]) -> np.random.RandomState:
    """Deterministic seeding (the reference's make_deterministic,
    train.py:1206-1213; JAX is deterministic by construction, so only the
    host RNG needs pinning)."""
    if seed is None:
        seed = 12345
    rng = np.random.RandomState(seed)
    return rng


def model_log_coeff_fn(
    amplitudes: np.ndarray,
    state: SignModelState,
    basis,
    batch_size: int = 16384,
) -> Callable[[np.ndarray], np.ndarray]:
    """log psi = log|psi_ED| + i*pi*argmax(net) — exact amplitudes, learned
    phases (train.py:353-373)."""
    log_amplitude = np.log(np.abs(np.asarray(amplitudes, dtype=np.float64)))

    def log_coeff_fn(spins: np.ndarray) -> np.ndarray:
        spins = _bits.spins_to_array(spins)
        logits = forward_logits(state, spins, batch_size)
        phases = np.pi * np.argmax(logits, axis=1)
        a = log_amplitude[basis.index(spins)]
        return a + 1j * phases

    return log_coeff_fn


def optimize_sign_structure(
    spins: np.ndarray,
    hamiltonian: Operator,
    log_coeff_fn: Optional[Callable] = None,
    ground_state: Optional[np.ndarray] = None,
    number_sweeps: int = 10000,
    repetitions: int = 64,
    scale_field: Optional[float] = 0.0,
    seed: Optional[int] = None,
    cheat: bool = False,
    engine: str = "auto",
):
    """Assign sign labels to a sampled spin set.

    ``cheat=True`` reads exact signs from the ground state
    (train.py:214-226); otherwise builds the Ising model with the current
    log-coeff oracle and anneals it (train.py:227-268), applying a global
    flip if the result anti-correlates with the initial signs.

    Returns (unique spins, labels in {0: positive, 1: negative}, counts).
    """
    spins = _bits.spins_to_array(spins)
    spins, counts = np.unique(spins, return_counts=True)

    if cheat:
        if ground_state is None:
            raise ValueError("cheat=True requires the exact ground state")
        indices = hamiltonian.basis.index(spins)
        labels = (np.asarray(ground_state)[indices] < 0).astype(np.int64)
        return spins, labels, counts

    model = make_ising_model(
        spins,
        hamiltonian,
        log_psi_fn=log_coeff_fn,
        scale_field=0.0 if scale_field == 0.0 else (scale_field or 0.0),
        external_field=scale_field is None,
    )
    x, _ = anneal(
        model.ising_hamiltonian,
        x0=model.initial_signs,
        seed=seed,
        number_sweeps=number_sweeps,
        repetitions=repetitions,
        only_best=True,
        bucket=True,  # outer iterations resample K; bound the kernel shapes
        engine=engine,
    )
    signs = _bits.bits_to_signs(x, model.size)
    signs0 = _bits.bits_to_signs(model.initial_signs, model.size)
    overlap = float(np.mean(signs == signs0))
    logger.debug("Initial unweighted accuracy: {}", overlap)
    if overlap < 0.5:
        logger.warning("Applying global sign flip...")
        signs = -signs
    labels = (signs < 0).astype(np.int64)
    # model.spins is the deduplicated sorted set == spins
    return model.spins, labels, counts


def tune_sign_structure(*args, **kwargs):
    """Alias matching the reference's gen-2 name (train.py:275-331)."""
    return optimize_sign_structure(*args, **kwargs)


def compute_metrics_on_full_space(
    basis,
    ground_state: np.ndarray,
    state: SignModelState,
    batch_size: int = 16384,
    subsample: Optional[int] = None,
) -> Dict[str, float]:
    """Unweighted accuracy + psi^2-weighted overlap of the network's signs
    over the whole basis (train.py:1216-1240).

    ``subsample=N`` (N < number of basis states) switches to an unbiased
    Monte-Carlo estimate: accuracy from N uniform basis draws, overlap from
    N psi^2-distributed draws (the overlap IS the psi^2-expectation of the
    per-state sign agreement, so sampling states ~ psi^2 and averaging the
    +-1 agreement estimates it directly). Standard error ~ N^{-1/2}; the
    returned dict carries ``metrics_subsample`` so logs/metrics files
    record that the numbers are estimates. The draw uses a fixed internal
    seed, so successive calls score the SAME evaluation set — differences
    across training iterations reflect the network, not sampling noise. Used when the basis is orders
    of magnitude larger than the evaluation budget (kagome-36: 31.5M
    states)."""
    ground_state = np.asarray(ground_state)
    n = basis.number_states
    if subsample is not None and subsample < n:
        rng = np.random.RandomState(0x5AB5A)
        correct = (ground_state < 0).astype(np.int64)

        def agreement(indices: np.ndarray) -> np.ndarray:
            # states repeat under concentrated psi^2 sampling: evaluate the
            # network once per unique state and scatter back
            uniq, inverse = np.unique(indices, return_inverse=True)
            logits = forward_logits(state, basis.states[uniq], batch_size)
            predicted = np.argmax(logits, axis=1)
            return (predicted == correct[uniq]).astype(np.float64)[inverse]

        acc_idx = rng.randint(0, n, size=subsample)
        accuracy = float(np.mean(agreement(acc_idx)))
        weights = ground_state.astype(np.float64) ** 2
        weights /= weights.sum()
        ov_idx = rng.choice(n, size=subsample, replace=True, p=weights)
        # |mean(+-1 agreement)|: near zero true overlap the absolute value
        # of a zero-mean sample average is biased UP by ~(2/pi N)^{1/2}
        # (half-normal mean), so a "dead network" reads ~4e-4 at N=1e6,
        # not 0. The SIGNED mean is reported alongside so readers can see
        # when the estimate is noise-dominated (|signed| ~ 1/sqrt(N)).
        signed_overlap = float(np.mean(2.0 * agreement(ov_idx) - 1.0))
        return {
            "accuracy": accuracy,
            "overlap": abs(signed_overlap),
            "overlap_signed": signed_overlap,
            "metrics_subsample": float(subsample),
        }
    logits = forward_logits(state, basis.states, batch_size)
    predicted = np.argmax(logits, axis=1)
    correct = (ground_state < 0).astype(np.int64)
    mask = predicted == correct
    accuracy = float(np.mean(mask))
    weights = ground_state ** 2
    overlap = float(np.abs(np.dot(2.0 * mask - 1.0, weights / weights.sum())))
    return {"accuracy": accuracy, "overlap": overlap}


def find_ground_state(
    hamiltonian: Operator,
    ground_state: np.ndarray,
    state: SignModelState,
    config: TrainingConfig,
    on_iteration_end=None,
) -> SignModelState:
    """The outer self-training loop (train.py:461-555).

    Per iteration: sample spins ~ |psi|^p, optimise their signs with SA on
    the Ising model built from (ED amplitudes x current network phases),
    train the network on the resulting labels, checkpoint, re-evaluate
    full-space metrics.

    When ``config.output`` is set, the loop is resumable: each iteration's
    SA-labelled dataset is cached (``sa_dataset_{i}.h5``) and each finished
    iteration's params are checkpointed (``model_{i}``), so a retried run
    with the same output directory skips completed work while consuming an
    identical host-rng stream (a resumed run and an uninterrupted one
    produce the same result).
    """
    if config.output is not None:
        _check_resume_fingerprint(config)
    rng = make_deterministic(config.seed)
    basis = hamiltonian.basis
    amplitudes = np.abs(np.asarray(ground_state))
    p = amplitudes ** config.sampled_power
    p /= p.sum()

    scale_field = config.scale_field
    if scale_field is None:
        # gen-2 default: zero fields first, boundary fields afterwards
        # (train.py:503)
        scale_field = [0.0] + [None] * config.number_outer_iterations

    # full-space metrics batch: large systems (kagome-36: 31.5M states) go
    # through a high-latency relay, so fewer/larger dispatches win
    metrics_batch = 65536 if basis.number_states > (1 << 20) else 16384

    metrics = compute_metrics_on_full_space(
        basis, ground_state, state, batch_size=metrics_batch,
        subsample=config.metrics_subsample,
    )
    logger.info(
        "Accuracy = {}, overlap = {}", metrics["accuracy"], metrics["overlap"]
    )
    history = [metrics]

    for i in range(config.number_outer_iterations):
        # draw ALL host randomness for this iteration up front, whether or
        # not the iteration is skipped below: a resumed run must consume the
        # identical rng stream as an uninterrupted one
        batch_indices = rng.choice(
            basis.number_states, size=config.number_monte_carlo_samples, replace=True, p=p
        )
        sa_seed = int(rng.randint(1 << 31))
        train_seed = int(rng.randint(1 << 31))

        # relay-stall resume: an iteration whose checkpoint already exists
        # (this run died after save_checkpoint and was retried) is reloaded
        # instead of re-run; partial orbax saves are committed atomically so
        # a directory that exists is a finished iteration
        if config.output is not None and _checkpoint_exists(config.output, i + 1):
            state = load_checkpoint(state, config.output, i + 1)
            metrics = compute_metrics_on_full_space(
                basis, ground_state, state, batch_size=metrics_batch,
                subsample=config.metrics_subsample,
            )
            logger.info(
                "Resumed iteration {} from checkpoint: accuracy = {}, overlap = {}",
                i + 1, metrics["accuracy"], metrics["overlap"],
            )
            history.append(metrics)
            if on_iteration_end is not None:
                on_iteration_end(i, state, metrics)
            continue

        logger.info("Starting outer iteration {}...", i + 1)
        spins = basis.states[batch_indices]
        log_fn = model_log_coeff_fn(amplitudes, state, basis)

        def _builder():
            return optimize_sign_structure(
                spins,
                hamiltonian,
                log_coeff_fn=log_fn,
                ground_state=ground_state,
                number_sweeps=config.number_sa_sweeps,
                repetitions=config.sa_repetitions,
                scale_field=scale_field[i] if i < len(scale_field) else None,
                seed=sa_seed,
                engine=config.sa_engine,
            )

        if config.output is not None:
            # the SA label solve is the expensive half of an iteration; cache
            # it so a death during the subsequent NN training resumes without
            # re-annealing
            spins_u, labels, counts = cached_sa_dataset(
                os.path.join(config.output, f"sa_dataset_{i + 1}.h5"), _builder
            )
        else:
            spins_u, labels, counts = _builder()

        # |psi|^p training weights over the unique sampled spins (the
        # reference's kagome_36_annealing, train.py:1705-1708); only the
        # relative values matter — the trainer renormalises per batch
        train_weights = amplitudes[basis.index(spins_u)] ** config.sampled_power
        state = tune_neural_network(
            state,
            spins_u,
            labels,
            weights=train_weights,
            epochs=config.number_supervised_epochs,
            batch_size=config.train_batch_size,
            seed=train_seed,
        )

        if config.output is not None:
            save_checkpoint(state, config.output, i + 1)
        metrics = compute_metrics_on_full_space(
            basis, ground_state, state, batch_size=metrics_batch,
            subsample=config.metrics_subsample,
        )
        logger.info(
            "Accuracy = {}, overlap = {}", metrics["accuracy"], metrics["overlap"]
        )
        history.append(metrics)
        if on_iteration_end is not None:
            on_iteration_end(i, state, metrics)

    state.history = history
    return state


def test_simulated_annealing_on_patches(
    hamiltonian: Operator,
    ground_state: np.ndarray,
    sampled_power: float = 2.0,
    number_sweeps: int = 2000,
    number_monte_carlo_samples: int = 2000,
    number_outer_iterations: int = 2,
    repetitions: int = 16,
    seed: int = 12345,
):
    """Exact-field vs zero-field SA comparison on sampled patches
    (train.py:392-458): how much does including the boundary field
    h_i = sum_{j not in K} c_ij |psi_i| psi_j help sign recovery on
    Monte-Carlo-sampled subsets? Returns a list of per-iteration dicts."""
    rng = make_deterministic(seed)
    basis = hamiltonian.basis
    p = np.abs(ground_state) ** sampled_power
    p /= p.sum()
    log_fn = ground_state_to_log_coeff_fn(ground_state, basis)

    results = []
    for i in range(number_outer_iterations):
        batch = rng.choice(basis.number_states, size=number_monte_carlo_samples,
                           replace=True, p=p)
        spins = np.unique(basis.states[batch])
        exact = (np.asarray(ground_state)[basis.index(spins)] < 0).astype(np.int64)

        row = {}
        for label, kwargs in [
            ("zero_field", dict(scale_field=0.0)),
            ("exact_field", dict(external_field=True)),
        ]:
            model = make_ising_model(spins, hamiltonian, log_psi_fn=log_fn, **kwargs)
            x, _ = anneal(
                model.ising_hamiltonian,
                x0=model.initial_signs,
                seed=int(rng.randint(1 << 31)),
                number_sweeps=number_sweeps,
                repetitions=repetitions,
            )
            labels = (_bits.bits_to_signs(x, model.size) < 0).astype(np.int64)
            acc = float(np.mean(labels == exact))
            row[label] = max(acc, 1.0 - acc)
        logger.info(
            "SA accuracy with exact fields: {:.4f}; with zero fields: {:.4f}",
            row["exact_field"], row["zero_field"],
        )
        results.append(row)
    return results


def cached_sa_dataset(cache_path: str, builder):
    """Build-or-load an (spins, labels, counts) supervised dataset.

    SA-produced training sets are expensive; like the reference's
    ``training_dataset.h5`` reuse (train.py:577-626), the dataset is built
    once by ``builder()`` and then read from disk on subsequent runs.
    """
    import h5py

    if os.path.exists(cache_path):
        logger.info("Reusing cached training dataset {}", cache_path)
        with h5py.File(cache_path, "r") as f:
            return (
                np.asarray(f["spins"], dtype=np.uint64),
                np.asarray(f["labels"], dtype=np.int64),
                np.asarray(f["counts"], dtype=np.int64),
            )
    spins, labels, counts = builder()
    os.makedirs(os.path.dirname(os.path.abspath(cache_path)), exist_ok=True)
    # write-then-rename: a run killed mid-write must not leave a truncated
    # cache that a resumed run would trust
    wip = cache_path + ".wip"
    with h5py.File(wip, "w") as f:
        f["spins"] = np.asarray(spins, dtype=np.uint64)
        f["labels"] = np.asarray(labels, dtype=np.int64)
        f["counts"] = np.asarray(counts, dtype=np.int64)
    os.replace(wip, cache_path)
    logger.info("Cached training dataset to {}", cache_path)
    return spins, labels, counts


def _checkpoint_exists(output_dir: str, iteration: int) -> bool:
    """True when save_checkpoint(·, output_dir, iteration) committed (orbax
    renames the tmp dir into place only on success, so presence == done)."""
    return os.path.isdir(os.path.abspath(os.path.join(output_dir, f"model_{iteration}")))


def save_checkpoint(state: SignModelState, output_dir: str, iteration: int) -> None:
    """Checkpoint model params per outer iteration (the reference's
    model_{i}.pt saves, train.py:549-551) using orbax."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, f"model_{iteration}"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    payload = {"params": state.params}
    if state.batch_stats is not None:
        payload["batch_stats"] = state.batch_stats
    ckpt.save(path, payload, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(state: SignModelState, output_dir: str, iteration: int) -> SignModelState:
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(output_dir, f"model_{iteration}"))
    ckpt = ocp.StandardCheckpointer()
    payload = {"params": state.params}
    if state.batch_stats is not None:
        payload["batch_stats"] = state.batch_stats
    restored = ckpt.restore(path, payload)
    state.params = restored["params"]
    state.batch_stats = restored.get("batch_stats")
    return state
