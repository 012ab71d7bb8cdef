"""Batched annealing of many independent Ising models.

The cluster pipeline produces thousands of independent small Ising models
(SURVEY §2.4 P4). Instead of launching one kernel per cluster, the models
are concatenated into a single block-diagonal problem — disjoint clusters
never interact, so one replica-parallel anneal sweeps them all at once and
the per-cluster best replica is read off afterwards. This turns the
reference's per-cluster native-solver calls into one large TPU launch.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
import scipy.sparse

from .. import bits as _bits
from ..ising import IsingHamiltonian, IsingModel
from ..ops.sweeps_xla import make_color_plan, run_annealing
from ..utils.log import logger
from .sa import estimate_betas

__all__ = ["concat_hamiltonians", "anneal_batched"]


def concat_hamiltonians(
    hamiltonians: Sequence[IsingHamiltonian],
) -> Tuple[IsingHamiltonian, np.ndarray]:
    """Block-diagonal union; returns (big hamiltonian, offsets (B+1,))."""
    blocks = [h.exchange for h in hamiltonians]
    exchange = scipy.sparse.block_diag(blocks, format="csr")
    field = np.concatenate([h.field for h in hamiltonians])
    offsets = np.zeros(len(hamiltonians) + 1, dtype=np.int64)
    np.cumsum([h.size for h in hamiltonians], out=offsets[1:])
    return IsingHamiltonian(exchange, field), offsets


def anneal_batched(
    models: Sequence[IsingModel],
    seed: int = 12345,
    number_sweeps: int = 5120,
    repetitions: int = 64,
    block_size: int = 512,
    mesh=None,
) -> List[np.ndarray]:
    """Anneal all models simultaneously; returns per-model packed bits of
    the per-model best replica.

    The β schedule spans the coupling scales of the whole batch (a
    geometric ramp is scale-local, so heterogeneous clusters coexist on
    one schedule). With ``mesh`` the replica axis shards over the device
    mesh (parallel.anneal_sharded): the cluster-stream batching and the
    multi-chip replica scatter compose.
    """
    if len(models) == 0:
        return []
    big, offsets = concat_hamiltonians([m.ising_hamiltonian for m in models])
    K = big.size
    logger.debug(
        "batched anneal: {} models, {} spins total", len(models), K
    )
    plan = make_color_plan(big, block_size=block_size)
    b0, b1 = estimate_betas(big)
    T = int(number_sweeps)
    betas = b0 * (b1 / b0) ** (np.arange(T) / max(T - 1, 1))

    rng = np.random.RandomState(seed)
    x0 = 2.0 * rng.randint(0, 2, size=(repetitions, K)).astype(np.float64) - 1.0
    if mesh is not None:
        from ..parallel.mesh import anneal_sharded

        bestS, _ = anneal_sharded(plan, x0, betas, seed=seed, mesh=mesh)
    else:
        _, _, bestS, _, _ = run_annealing(plan, x0, betas, seed=seed)

    # per-model, per-replica exact energies -> per-model best replica
    results = []
    for b, model in enumerate(models):
        lo, hi = offsets[b], offsets[b + 1]
        sub = bestS[:, lo:hi]
        energies = model.ising_hamiltonian.energies(sub)
        best = int(np.argmin(energies))
        results.append(_bits.signs_to_bits(sub[best]))
    return results
