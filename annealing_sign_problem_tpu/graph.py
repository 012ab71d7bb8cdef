"""On-the-fly Hilbert-space graph view.

The lazily-evaluated "almost infinite" graph whose nodes are basis states
and whose edge weights are |psi_s| <s|H|s'> |psi_s'| — used for coupling
statistics and exploratory walks (reference: AlmostInfiniteGraph,
common.py:20-43). Batched: neighbour queries vectorise over many seeds.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from . import bits as _bits
from .operator import Operator

__all__ = ["AlmostInfiniteGraph"]


class AlmostInfiniteGraph:
    def __init__(self, quantum_hamiltonian: Operator, ground_state: np.ndarray):
        self.quantum_hamiltonian = quantum_hamiltonian
        self.ground_state = np.asarray(ground_state, dtype=np.float64)

    def neighbours(self, spin: int) -> List[Tuple[int, float]]:
        """H-connected states with edge weights, sorted by |weight| desc
        (common.py:28-43)."""
        nodes, edges = self.batched_neighbours(np.array([spin], dtype=np.uint64))
        pairs = list(zip(nodes[0].tolist(), edges[0].tolist()))
        return sorted(
            [(s, w) for s, w in pairs if w != 0.0], key=lambda t: abs(t[1]), reverse=True
        )

    def batched_neighbours(self, spins: np.ndarray):
        """(neighbour states (B, P+1), weights (B, P+1)) with zero-weight
        padding; weight = |psi_s| c |psi_s'|."""
        spins = _bits.spins_to_array(spins)
        basis = self.quantum_hamiltonian.basis
        nbrs, coeffs = self.quantum_hamiltonian.apply_padded(jnp.asarray(spins))
        nbrs = np.asarray(nbrs)
        coeffs = np.asarray(coeffs)
        psi = np.abs(self.ground_state[basis.index(spins)])
        other_psi = np.abs(self.ground_state[basis.index(nbrs.reshape(-1))]).reshape(
            nbrs.shape
        )
        weights = psi[:, None] * coeffs * other_psi
        # drop the diagonal slot from the neighbour list (self-edge)
        return nbrs[:, 1:], weights[:, 1:]
