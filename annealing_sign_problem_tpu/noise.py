"""Amplitude-noise injection — a first-class experiment knob
(common.py:825-835; Figure 4 of the paper)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from . import bits as _bits

__all__ = ["add_noise_to_amplitudes", "amplitude_overlap"]


def add_noise_to_amplitudes(
    ground_state: np.ndarray, eps: float, rng: Optional[np.random.RandomState] = None
) -> np.ndarray:
    """log|psi| += eps * U(-1, 1); signs preserved; renormalised
    (common.py:825-835)."""
    ground_state = np.asarray(ground_state, dtype=np.float64)
    assert ground_state.ndim == 1
    if rng is None:
        rng = np.random
    log_amplitudes = np.log(np.abs(ground_state))
    signs = np.sign(ground_state)
    noise = eps * 2.0 * (rng.rand(log_amplitudes.size) - 0.5)
    noisy = signs * np.exp(log_amplitudes + noise)
    noisy /= np.linalg.norm(noisy)
    return noisy


def amplitude_overlap(cluster, ground_state, noisy_ground_state, basis) -> float:
    """Normalised overlap of |psi| and |noisy psi| restricted to a cluster
    (sampled_connected_components.py:719-723)."""
    indices = basis.index(_bits.spins_to_array(cluster))
    a = np.abs(np.asarray(ground_state)[indices])
    b = np.abs(np.asarray(noisy_ground_state)[indices])
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
