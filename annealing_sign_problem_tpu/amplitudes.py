"""The wavefunction-as-callable interface.

``log_coeff_fn(spins) -> complex log psi`` is the universal amplitude
oracle of the framework (reference: common.py:806-822): exact ED vectors
and neural sign networks hide behind the same signature, so the Ising
builder does not care where amplitudes come from.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from . import bits as _bits
from .basis import SpinBasis

__all__ = ["ground_state_to_log_coeff_fn", "determine_exact_solution"]


def ground_state_to_log_coeff_fn(
    ground_state: np.ndarray, basis: SpinBasis
) -> Callable[[np.ndarray], np.ndarray]:
    """log psi = log|psi| + i*pi*[psi < 0] looked up by basis index
    (common.py:806-822)."""
    ground_state = np.asarray(ground_state, dtype=np.float64)
    assert ground_state.ndim == 1
    log_amplitudes = np.log(np.abs(ground_state))
    phases = np.where(ground_state >= 0, 0.0, np.pi)

    def log_coeff_fn(spins: np.ndarray) -> np.ndarray:
        spins = _bits.spins_to_array(spins)
        indices = basis.index(spins)
        return log_amplitudes[indices] + 1j * phases[indices]

    return log_coeff_fn


def determine_exact_solution(spins, quantum_hamiltonian, ground_state) -> np.ndarray:
    """Packed signs of the exact wavefunction at the given spins
    (common.py:282-285)."""
    spins = _bits.spins_to_array(spins)
    indices = quantum_hamiltonian.basis.index(spins)
    psi = np.asarray(ground_state)[indices]
    return _bits.signs_to_bits(np.sign(psi))
