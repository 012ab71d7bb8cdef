"""Monte-Carlo seed sampling and stochastic cluster growth.

Mirrors common.py:270-279 (i.i.d. sampling from p ∝ |psi|^power) and
common.py:481-513 (stochastic BFS growth through Hamiltonian
connectivity). Cluster growth is inherently sequential/data-dependent and
stays host-side; everything downstream of it is static-shaped device work.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .operator import Operator

__all__ = [
    "SamplingResult",
    "monte_carlo_sampling",
    "create_small_cluster_around_point",
    "random_cluster_size",
]


@dataclass
class SamplingResult:
    spins: np.ndarray
    weights: Optional[np.ndarray]


def monte_carlo_sampling(
    states: np.ndarray,
    ground_state: np.ndarray,
    number_samples: int,
    sampled_power: float = 2.0,
    rng: Optional[np.random.RandomState] = None,
) -> SamplingResult:
    """i.i.d. samples from p ∝ |psi|^sampled_power over the given states
    (common.py:270-279)."""
    if rng is None:
        rng = np.random
    p = np.abs(np.asarray(ground_state, dtype=np.float64)) ** sampled_power
    p /= np.sum(p)
    indices = rng.choice(len(states), size=number_samples, replace=True, p=p)
    return SamplingResult(spins=np.asarray(states)[indices], weights=None)


def random_cluster_size(
    min_size: float, max_size: float, rng: Optional[np.random.RandomState] = None
) -> int:
    """Log-uniform cluster size (sampled_connected_components.py:647-650)."""
    if rng is None:
        rng = np.random
    u = rng.random_sample()
    log_size = np.log(min_size) + (np.log(max_size) - np.log(min_size)) * u
    return int(round(np.exp(log_size)))


def create_small_cluster_around_point(
    s0: int,
    hamiltonian: Operator,
    required_size: int = 20,
    keep_probability: float = 0.5,
    rng: Optional[np.random.RandomState] = None,
) -> List[int]:
    """Stochastic BFS from seed s0 through H-connectivity: each H-connected
    child is kept with probability ``keep_probability`` until
    ``required_size`` states are collected (common.py:481-513).

    The growth order and RNG stream match the reference's sequential loop,
    but operator applications batch per BFS frontier — one device call per
    level instead of one per state (the round trip dominates on remote
    accelerators)."""
    import jax.numpy as jnp

    if rng is None:
        rng = np.random
    s0 = int(s0)
    spins = {s0}

    def batched_neighbour_lists(states: List[int]) -> dict:
        # pad to a power of two: varying frontier sizes would otherwise
        # trigger a fresh compile per BFS level
        n = len(states)
        b = 1
        while b < n:
            b <<= 1
        padded = np.full(b, states[-1], dtype=np.uint64)
        padded[:n] = states
        nbrs, coeffs = hamiltonian.apply_padded(jnp.asarray(padded))
        nbrs = np.asarray(nbrs)[:n, 1:]
        coeffs = np.asarray(coeffs)[:n, 1:]
        return {
            s: [int(x) for x, c in zip(row, crow) if c != 0.0]
            for s, row, crow in zip(states, nbrs, coeffs)
        }

    def children_of(s: int, tables: dict) -> List[int]:
        children = []
        for x in tables[s]:
            if x in spins:
                continue
            if rng.rand() <= keep_probability:
                children.append(x)
        return children

    tables = batched_neighbour_lists([s0])
    children = children_of(s0, tables)
    while len(spins) < required_size and len(children) > 0:
        frontier = list(children)
        tables = batched_neighbour_lists(frontier)
        new_children = set()
        for child in frontier:
            spins.add(child)
            if len(spins) >= required_size:
                break
            new_children |= set(children_of(child, tables))
        children = new_children

    return sorted(spins)
