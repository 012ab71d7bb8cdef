"""Greedy graph coloring of the Ising interaction graph.

Spins of the same color are non-adjacent, so a Metropolis update of a whole
color class is a valid transition kernel (the product of independent
single-site kernels): sweeping color-by-color gives sequential-quality
mixing while every class updates as one vectorised TPU step. This is the
scheme that replaces the reference's inherently sequential CPU sweeps
(ising_glass_annealer; SURVEY §2.3).

A C++ implementation is used when the native extension is built
(cbits/solvers.cpp); the numpy fallback handles small problems.
"""

from __future__ import annotations

from typing import List

import numpy as np
import scipy.sparse

from ..utils.log import logger
from . import _native

__all__ = ["greedy_coloring", "color_classes"]


def greedy_coloring(exchange: scipy.sparse.spmatrix) -> np.ndarray:
    """Color indices (K,) such that no two adjacent spins share a color.

    First-fit greedy over vertices in natural order; the interaction graphs
    here have bounded degree (H-connectivity), so the number of colors is
    at most max-degree + 1.
    """
    csr = exchange.tocsr()
    n = csr.shape[0]
    native = _native.library()
    if native is not None:
        colors = np.zeros(n, dtype=np.int32)
        num = native.greedy_coloring(
            n,
            csr.indptr.astype(np.int64),
            csr.indices.astype(np.int32),
            colors,
        )
        logger.debug("coloring (native): {} colors for {} spins", num, n)
        return colors

    colors = np.full(n, -1, dtype=np.int32)
    max_degree = int(np.diff(csr.indptr).max()) if n else 0
    scratch = np.zeros(max_degree + 2, dtype=bool)
    indptr, indices = csr.indptr, csr.indices
    for i in range(n):
        nbr = indices[indptr[i] : indptr[i + 1]]
        nbr_colors = colors[nbr[nbr != i]]
        nbr_colors = nbr_colors[nbr_colors >= 0]
        scratch[:] = False
        scratch[nbr_colors[nbr_colors < len(scratch)]] = True
        colors[i] = int(np.argmin(scratch))  # first unused color
    logger.debug("coloring: {} colors for {} spins", colors.max() + 1 if n else 0, n)
    return colors


def color_classes(colors: np.ndarray) -> List[np.ndarray]:
    """Group spin indices by color."""
    order = np.argsort(colors, kind="stable")
    sorted_colors = colors[order]
    boundaries = np.nonzero(np.diff(sorted_colors))[0] + 1
    return np.split(order.astype(np.int32), boundaries)
