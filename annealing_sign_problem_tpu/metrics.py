"""Quality metrics: sign accuracy/overlap, frustration and coupling stats.

Reproduces the contracts of common.py:211-229 (accuracy is global-flip
invariant; overlap is amplitude-weighted), common.py:439-478
(cluster_statistics) and common.py:288-295 (coupling histogram).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from . import bits as _bits
from .utils.log import logger

__all__ = [
    "compute_accuracy_and_overlap",
    "cluster_statistics",
    "compute_distribution_of_couplings",
]


def compute_accuracy_and_overlap(
    predicted: np.ndarray,
    exact: np.ndarray,
    weights: Optional[np.ndarray] = None,
    number_spins: Optional[int] = None,
    informative_mask: Optional[np.ndarray] = None,
) -> Tuple[float, float]:
    """Sign accuracy (fraction of matching signs, max over the global flip)
    and weighted sign overlap |sum_i s_exact s_pred w_i| / sum w.

    ``predicted``/``exact`` are packed-bit sign vectors (common.py:211-229).
    Default semantics match the reference exactly: every spin is scored
    as predicted. ``informative_mask`` (e.g. ``~uninformative_spins(h)``)
    restricts the ACCURACY denominator to spins whose couplings carry
    sign information — the honest alternative when the exact ground state
    has strictly-zero amplitudes (kagome-18: 9.9% of the sector), whose
    stored "exact" signs are arbitrary conventions no solver can recover.
    Overlap is unaffected (zero-amplitude spins carry zero weight).
    """
    if weights is None and number_spins is None:
        raise ValueError("'weights' and 'number_spins' cannot be both None")
    if number_spins is None:
        number_spins = len(weights)
    if weights is None:
        weights = np.ones(number_spins, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)

    predicted_signs = _bits.bits_to_signs(predicted, number_spins)
    exact_signs = _bits.bits_to_signs(exact, number_spins)
    agree = exact_signs == predicted_signs
    if informative_mask is not None:
        agree = agree[np.asarray(informative_mask, dtype=bool)]
    accuracy = float(np.mean(agree)) if agree.size else 1.0
    accuracy = max(accuracy, 1.0 - accuracy)
    overlap = float(
        abs(np.dot(exact_signs * predicted_signs, weights / np.sum(weights)))
    )
    return accuracy, min(overlap, 1.0)  # clip float-noise overshoot


def cluster_statistics(ising_model) -> dict:
    """Fraction of frustrated bonds and frustrated strongest-bonds for an
    :class:`~annealing_sign_problem_tpu.ising.IsingModel` (common.py:439-478).

    A bond (i, j) is frustrated when J_ij s_i s_j > 0 for the initial
    (wavefunction) signs.
    """
    signs = _bits.bits_to_signs(ising_model.initial_signs, ising_model.size)
    matrix = ising_model.ising_hamiltonian.exchange.tocoo()
    off = matrix.row != matrix.col
    rows, cols, data = matrix.row[off], matrix.col[off], matrix.data[off]

    is_frustrated = data * signs[rows] * signs[cols] > 0

    # strongest bond per row, vectorised: sort the off-diagonal COO entries
    # by (row, |J|) and keep each row's last (largest-magnitude) entry
    n = ising_model.size
    is_largest_frustrated = np.zeros(n, dtype=bool)
    if len(data):
        order = np.lexsort((np.abs(data), rows))
        r, c, d = rows[order], cols[order], data[order]
        last = np.nonzero(np.diff(np.append(r, n + 1)))[0]  # per-row argmax
        is_largest_frustrated[r[last]] = d[last] * signs[r[last]] * signs[c[last]] > 0

    stats = {
        "spins": n,
        "bonds": int(off.sum()),
        "frustrated": float(np.mean(is_frustrated)) if len(data) else 0.0,
        "largest_frustrated": float(np.mean(is_largest_frustrated)),
    }
    logger.info(
        "Stats: spins={}, bonds={}, frustrated={}, largest_frustrated={}",
        stats["spins"],
        stats["bonds"],
        stats["frustrated"],
        stats["largest_frustrated"],
    )
    return stats


def compute_distribution_of_couplings(
    spins, quantum_hamiltonian, ground_state, max_slots: int = 1000
) -> np.ndarray:
    """Rank-ordered mean coupling magnitude per neighbour slot
    (common.py:288-295): for each seed state, couplings
    |psi_s| c |psi_s'| sorted by magnitude, averaged over seeds."""
    import jax.numpy as jnp

    spins = _bits.spins_to_array(spins)
    basis = quantum_hamiltonian.basis
    nbrs, coeffs = quantum_hamiltonian.apply_padded(jnp.asarray(spins))
    nbrs = np.asarray(nbrs)
    coeffs = np.asarray(coeffs)
    psi = np.abs(ground_state[basis.index(spins.reshape(-1))])
    flat = nbrs.reshape(-1)
    idx = basis.index(flat)
    other_psi = np.abs(np.asarray(ground_state)[idx]).reshape(nbrs.shape)
    couplings = np.abs(coeffs[:, 1:]) * psi[:, None] * other_psi[:, 1:]
    couplings = np.sort(couplings, axis=1)[:, ::-1]
    histogram = np.zeros(max_slots, dtype=np.float64)
    w = min(couplings.shape[1], max_slots)
    histogram[:w] = couplings[:, :w].mean(axis=0)
    return histogram
