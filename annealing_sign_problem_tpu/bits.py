"""Bit-packed spin configurations and sign packing.

A spin configuration of an ``n``-spin system (n <= 64, same cap as the
reference: common.py:86) is a single ``uint64`` word; bit ``i`` is the state
of site ``i`` (1 = up). Batches are 1-D ``uint64`` arrays. For neural nets
and vectorised operator application configurations are unpacked to
``(batch, n)`` arrays of ±1.

Sign vectors are packed 64 signs to a ``uint64`` word with the convention
bit = 1 <=> sign = +1, mirroring the reference's ``extract_signs``
(cbits/build_matrix.c:67-76) and ``ising_glass_annealer``'s
``signs_to_bits``/``bits_to_signs`` surface (common.py:205,224-225).

The reference performs bit unpacking with an external CUDA kernel
(``unpack_bits``, train.py:1354); here it is a couple of fused XLA
vector ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "unpack",
    "pack",
    "popcount",
    "bits_to_signs_batched",
    "signs_to_bits",
    "signs_to_bits_batched",
    "bits_to_signs",
    "spins_to_array",
]


def spins_to_array(spins) -> np.ndarray:
    """Normalise host-side spin input to a 1-D contiguous uint64 array.

    Accepts scalars, lists, 1-D arrays, or the reference's 512-bit
    ``(batch, 8)`` layout (common.py:58-68), of which only word 0 is used
    (systems are capped at 64 spins).
    """
    spins = np.asarray(spins, dtype=np.uint64)
    if spins.ndim == 0:
        spins = spins.reshape(1)
    elif spins.ndim == 2:
        spins = spins[:, 0]
    elif spins.ndim > 2:
        raise ValueError(f"'spins' has wrong shape: {spins.shape}")
    return np.ascontiguousarray(spins)


def unpack(spins: jax.Array, number_spins: int, dtype=jnp.float32) -> jax.Array:
    """Unpack uint64 words into ``(batch, number_spins)`` of ±1 values.

    TPU-native replacement for the reference's CUDA ``unpack_bits.unpack``
    (train.py:1354, astrakhantsev_2021.py:293).
    """
    spins = jnp.asarray(spins, dtype=jnp.uint64)
    if spins.ndim == 2:  # (batch, 8) bits512 layout
        spins = spins[:, 0]
    shifts = jnp.arange(number_spins, dtype=jnp.uint64)
    bits = (spins[..., None] >> shifts) & jnp.uint64(1)
    return (2 * bits.astype(jnp.int32) - 1).astype(dtype)


def pack(bits: jax.Array) -> jax.Array:
    """Pack ``(batch, n)`` of {0,1} or ±1 values into uint64 words."""
    bits = jnp.asarray(bits)
    bits = jnp.where(bits > 0, 1, 0).astype(jnp.uint64)
    n = bits.shape[-1]
    if n > 64:
        raise ValueError("only systems with up to 64 spins are supported")
    shifts = jnp.arange(n, dtype=jnp.uint64)
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint64)


def popcount(x: jax.Array) -> jax.Array:
    """Number of set bits per uint64 word."""
    return jax.lax.population_count(jnp.asarray(x, dtype=jnp.uint64)).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Packed sign vectors (bit = 1 <=> sign +1), host-side numpy implementations:
# these are tiny metadata transforms used at the API boundary, matching the
# surface of ising_glass_annealer (common.py:205,224-225,258-260).
# ---------------------------------------------------------------------------


def signs_to_bits(signs) -> np.ndarray:
    """Pack a ±1 (or arbitrary-sign float) vector into uint64 words.

    Mirrors ``extract_signs`` of the reference C kernel
    (cbits/build_matrix.c:67-76): bit i is set iff signs[i] > 0.
    """
    signs = np.asarray(signs)
    n = signs.shape[0]
    num_words = (n + 63) // 64
    padded = np.zeros(num_words * 64, dtype=np.uint64)
    padded[:n] = (signs > 0).astype(np.uint64)
    words = padded.reshape(num_words, 64)
    shifts = np.arange(64, dtype=np.uint64)
    return (words << shifts).sum(axis=1).astype(np.uint64)


def signs_to_bits_batched(signs: np.ndarray) -> np.ndarray:
    """Pack a (R, n) ±1 matrix into (R, ceil(n/64)) uint64 words — one
    vectorised pass instead of a Python loop over replicas."""
    signs = np.asarray(signs)
    R, n = signs.shape
    num_words = (n + 63) // 64
    padded = np.zeros((R, num_words * 64), dtype=np.uint64)
    padded[:, :n] = (signs > 0).astype(np.uint64)
    shifts = np.arange(64, dtype=np.uint64)[None, None, :]
    return (padded.reshape(R, num_words, 64) << shifts).sum(axis=2).astype(np.uint64)


def bits_to_signs(bits, count: int) -> np.ndarray:
    """Unpack uint64 words into a float64 ±1 vector of length ``count``."""
    bits = np.asarray(bits, dtype=np.uint64).reshape(-1)
    i = np.arange(count, dtype=np.uint64)
    b = (bits[i // 64] >> (i % 64)) & np.uint64(1)
    return (2.0 * b.astype(np.float64)) - 1.0


def bits_to_signs_batched(bits: np.ndarray, count: int) -> np.ndarray:
    """Unpack (R, words) uint64 rows into an (R, count) ±1 matrix — one
    vectorised pass instead of a Python loop over replicas."""
    bits = np.asarray(bits, dtype=np.uint64)
    i = np.arange(count, dtype=np.uint64)
    b = (bits[:, i // 64] >> (i % 64)[None, :]) & np.uint64(1)
    return (2.0 * b.astype(np.float64)) - 1.0
