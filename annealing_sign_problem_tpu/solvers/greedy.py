"""Deterministic greedy sign solver.

Strongest-coupling-first signed clustering with a parity union-find,
followed by a local-flip polish — the O(K log K) deterministic algorithm of
the paper (README.md:25-26; Python prototype common.py:298-438). Runs in
native C++ (cbits/solvers.cpp) with a numpy fallback: the algorithm is
inherently sequential, so it belongs on the host, not the TPU.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse

from .. import bits as _bits
from ..utils.log import logger
from . import _native

__all__ = ["greedy_solve", "greedy_solve_signs"]


def greedy_solve_signs(exchange: scipy.sparse.spmatrix, field: np.ndarray) -> np.ndarray:
    """±1 sign vector minimising s^T J s + h^T s greedily."""
    csr = exchange.tocsr()
    n = csr.shape[0]
    field = np.asarray(field, dtype=np.float64)

    native = _native.library()
    if native is not None:
        signs = np.empty(n, dtype=np.float64)
        native.greedy_solve(
            n,
            csr.indptr.astype(np.int64),
            csr.indices.astype(np.int32),
            csr.data.astype(np.float64),
            field,
            signs,
        )
        return signs

    # ---- numpy fallback (same algorithm) ----
    coo = csr.tocoo()
    mask = (coo.row < coo.col) & (coo.data != 0.0)
    rows, cols, vals = coo.row[mask], coo.col[mask], coo.data[mask]
    order = np.argsort(-np.abs(vals), kind="stable")

    parent = np.arange(n, dtype=np.int64)
    rank = np.zeros(n, dtype=np.int32)
    parity = np.zeros(n, dtype=np.uint8)

    def find(i: int) -> Tuple[int, int]:
        path = []
        p = 0
        while parent[i] != i:
            path.append(i)
            p ^= parity[i]
            i = parent[i]
        # compress
        acc = p
        for node in path:
            old = parity[node]
            parent[node] = i
            parity[node] = acc
            acc ^= old
        return i, p

    for k in order:
        i, j, w = int(rows[k]), int(cols[k]), float(vals[k])
        ri, pi = find(i)
        rj, pj = find(j)
        if ri == rj:
            continue
        want = 1 if w > 0 else 0
        link = pi ^ pj ^ want
        if rank[ri] < rank[rj]:
            parent[ri], parity[ri] = rj, link
        elif rank[ri] > rank[rj]:
            parent[rj], parity[rj] = ri, link
        else:
            parent[rj], parity[rj] = ri, link
            rank[ri] += 1

    signs = np.empty(n, dtype=np.float64)
    for i in range(n):
        _, p = find(i)
        signs[i] = -1.0 if p else 1.0

    # sequential local-flip polish
    indptr, indices, data = csr.indptr, csr.indices, csr.data
    for _ in range(1000):
        changed = False
        for i in range(n):
            lo, hi = indptr[i], indptr[i + 1]
            nbr = indices[lo:hi]
            w = data[lo:hi]
            off = nbr != i
            local = float(np.dot(w[off], signs[nbr[off]]))
            if signs[i] * (2.0 * local + field[i]) > 0.0:
                signs[i] = -signs[i]
                changed = True
        if not changed:
            break
    return signs


def greedy_solve(hamiltonian) -> Tuple[np.ndarray, float]:
    """Solve an :class:`~annealing_sign_problem_tpu.ising.IsingHamiltonian`;
    returns (packed bits, energy). Mirrors ``sa.greedy_solve``
    (common.py:250)."""
    signs = greedy_solve_signs(hamiltonian.exchange, hamiltonian.field)
    energy = hamiltonian.energy(signs)
    logger.debug("greedy solve: {} spins, energy {}", len(signs), energy)
    return _bits.signs_to_bits(signs), energy
