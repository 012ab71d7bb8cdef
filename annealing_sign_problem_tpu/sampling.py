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

from . import bits as _bits
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
    ``required_size`` states are collected (common.py:481-513)."""
    if rng is None:
        rng = np.random
    s0 = int(s0)
    spins = {s0}

    def children_of(s: int) -> List[int]:
        xs, cs = hamiltonian.apply(np.uint64(s))
        children = []
        for x, c in zip(xs.tolist(), cs.tolist()):
            if x in spins or c == 0.0:
                continue
            if rng.rand() <= keep_probability:
                children.append(int(x))
        return children

    children = children_of(s0)
    while len(spins) < required_size and len(children) > 0:
        new_children = set()
        for child in children:
            spins.add(child)
            if len(spins) >= required_size:
                break
            new_children |= set(children_of(child))
        children = new_children

    return sorted(spins)
