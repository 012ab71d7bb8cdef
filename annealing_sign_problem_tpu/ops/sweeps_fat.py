"""Color-class ("fat") MXU Metropolis engine.

The block-major dense engine (sweeps_dense.py) tiles every color class
into uniform 256-row blocks and scans one block per step: kagome-16's
12870 spins color into just NINE classes (sizes 3046...1), so a sweep
runs 55 small (256, Kp) matmuls where nine class-sized ones would do.
This engine updates one whole color class per step instead:

- spins are reordered class-major, each class padded to a multiple of
  128 rows (MXU tile alignment), so Kp is *smaller* than the block
  engine's (14080 -> 13440 on kagome-16: per-class padding beats
  per-256-block padding);
- class offsets are Python ints, so every slice of S is static — no
  dynamic_slice, no gather;
- one sweep = num_colors matmuls of shape (m_c, Kp) @ (Kp, R), unrolled
  inside a `lax.scan` over sweeps. Semantics are identical to the block
  engine (spins within a class never couple, so simultaneous Metropolis
  updates are exact; reference annealer surface: ising_glass_annealer,
  SURVEY §2.3).

Same chunked-dispatch / packed-transfer discipline as sweeps_dense
(relay tolerates only a few seconds of device time per dispatch).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sweeps_xla import _pack_words_host, _unpack_words

__all__ = ["FatPlan", "make_fat_plan", "run_annealing_fat"]


@dataclass(frozen=True)
class FatPlan:
    """Class-major dense coupling layout for the color-class engine."""

    J: np.ndarray  # (Kp, Kp) float32 (device copy cast to j_dtype)
    field: np.ndarray  # (Kp,) float32
    perm: np.ndarray  # (Kp,) reordered row -> original spin id (K = sentinel)
    offsets: tuple  # per-class (row_start, padded_rows), Python ints
    num_spins: int  # K
    j_dtype: str = "float32"

    @property
    def padded_size(self) -> int:
        return self.J.shape[0]

    @property
    def num_colors(self) -> int:
        return len(self.offsets)

    def device_arrays(self):
        cached = getattr(self, "_device", None)
        if cached is None:
            dt = jnp.bfloat16 if self.j_dtype == "bfloat16" else jnp.float32
            cached = (jnp.asarray(self.J, dtype=dt), jnp.asarray(self.field))
            object.__setattr__(self, "_device", cached)
        return cached


def make_fat_plan(
    hamiltonian,
    colors: Optional[np.ndarray] = None,
    j_dtype: str = "float32",
    align: int = 128,
) -> FatPlan:
    """Class-major densification: rows grouped by color class, each class
    padded to a multiple of ``align`` rows (sentinel rows have zero
    couplings and zero field, so they never flip the physics — their
    Metropolis moves are rejected by the zero-delta rule)."""
    from ..solvers.coloring import color_classes, greedy_coloring

    exchange = hamiltonian.exchange.tocsr()
    K = hamiltonian.size
    if colors is None:
        colors = greedy_coloring(exchange)
    classes = color_classes(np.asarray(colors))

    perm_parts = []
    offsets = []
    row = 0
    for cls in classes:
        cls = np.asarray(cls, dtype=np.int64)
        m = int(-(-len(cls) // align) * align)
        pad = np.full(m - len(cls), K, dtype=np.int64)
        perm_parts.append(np.concatenate([cls, pad]))
        offsets.append((row, m))
        row += m
    perm = np.concatenate(perm_parts)
    Kp = row

    inv = np.full(K + 1, Kp, dtype=np.int64)
    real = perm != K
    inv[perm[real]] = np.nonzero(real)[0]

    coo = exchange.tocoo()
    J = np.zeros((Kp, Kp + 1), dtype=np.float32)  # last col absorbs sentinels
    J[inv[coo.row], inv[coo.col]] = coo.data.astype(np.float32)
    field = np.zeros(Kp, dtype=np.float32)
    field[inv[np.arange(K)]] = np.asarray(hamiltonian.field, dtype=np.float32)
    return FatPlan(
        J=np.ascontiguousarray(J[:, :Kp]),
        field=field,
        perm=perm,
        offsets=tuple(offsets),
        num_spins=K,
        j_dtype=j_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "num_sweeps", "track_trace"),
)
def _fat_chunk(
    J: jax.Array,  # (Kp, Kp) j_dtype
    field: jax.Array,  # (Kp,) f32
    S: jax.Array,  # (Kp, R) j_dtype ±1
    E: jax.Array,  # (R,) f64
    bestS: jax.Array,
    bestE: jax.Array,
    betas: jax.Array,  # (num_sweeps,) f32
    seed: jax.Array,  # () uint32
    step0: jax.Array,  # () int32
    offsets,
    num_sweeps: int,
    track_trace: bool,
):
    R = S.shape[1]
    C = len(offsets)

    def sweep(carry, inputs):
        S, E, bestS, bestE = carry
        beta, sweep_index = inputs
        for c, (o, m) in enumerate(offsets):
            local = jnp.dot(
                jax.lax.slice_in_dim(J, o, o + m), S,
                preferred_element_type=jnp.float32,
            )  # (m, R)
            s_cur = jax.lax.slice_in_dim(S, o, o + m)
            s_f = s_cur.astype(jnp.float32)
            delta = -2.0 * s_f * (2.0 * local + field[o : o + m][:, None])
            step = (step0 + sweep_index * C + c).astype(jnp.uint32)
            k = jnp.stack(
                [seed, jnp.uint32(0x9E3779B9), jnp.uint32(0), step]
            )
            _, bits = jax.lax.rng_bit_generator(k, (m, R), dtype=jnp.uint32)
            u = (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
                1.0 / (1 << 24)
            )
            # zero-delta moves REJECTED (isolated/padding spins keep signs)
            accept = (delta != 0) & ((delta < 0) | (u < jnp.exp(-beta * delta)))
            S = jax.lax.dynamic_update_slice_in_dim(
                S, jnp.where(accept, -s_cur, s_cur), o, axis=0
            )
            E = E + jnp.sum(
                jnp.where(accept, delta, 0.0), axis=0, dtype=jnp.float64
            )
        better = E < bestE
        bestE = jnp.where(better, E, bestE)
        bestS = jnp.where(better[None, :], S, bestS)
        out = (E, bestE) if track_trace else None
        return (S, E, bestS, bestE), out

    (S, E, bestS, bestE), trace = jax.lax.scan(
        sweep, (S, E, bestS, bestE), (betas, jnp.arange(num_sweeps))
    )
    return S, E, bestS, bestE, trace


@functools.partial(jax.jit, static_argnames=())
def _fat_init(J, field, init_words):
    Kp = J.shape[0]
    W, R = init_words.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    bits = ((init_words[:, None, :] >> shifts) & 1).reshape(W * 32, R)[:Kp]
    S = (2 * bits.astype(jnp.int32) - 1).astype(J.dtype)
    # E(s) = s^T J s + h^T s with the FULL symmetric J (ising.py energy
    # convention) — summing s_i * local_i over every row gives s^T J s
    local = jnp.dot(J, S, preferred_element_type=jnp.float32)  # (Kp, R)
    E = jnp.sum(
        S.astype(jnp.float32) * (local + field[:, None]),
        axis=0,
        dtype=jnp.float64,
    )
    return S, E


def run_annealing_fat(
    plan: FatPlan,
    x0_signs: np.ndarray,  # (R, K) ±1
    betas: np.ndarray,
    seed: int,
    track_trace: bool = False,
    sweeps_per_chunk: Optional[int] = None,
    need_final: bool = True,
) -> Tuple[Optional[np.ndarray], np.ndarray, np.ndarray, np.ndarray, Optional[tuple]]:
    """Same contract as run_annealing_dense (sweeps_dense.py)."""
    from .sweeps_dense import _pack_device, _pack_two

    R, K0 = x0_signs.shape
    K = plan.num_spins
    assert K0 == K
    Kp = plan.padded_size
    T = len(betas)
    if sweeps_per_chunk is None:
        flops_per_sweep = 2.0 * Kp * Kp * R
        sweeps_per_chunk = int(min(max(4.0 * 8e13 / flops_per_sweep, 16), 8192))

    ext = np.ones((K + 1, R), dtype=np.float64)
    ext[:K] = x0_signs.T
    S_host = ext[plan.perm]  # (Kp, R)

    J_dev, field_dev = plan.device_arrays()
    words = _pack_words_host(np.ascontiguousarray(S_host.T))
    S, E = _fat_init(J_dev, field_dev, jnp.asarray(words))
    bestS, bestE = S, E

    seed32 = jnp.uint32(seed & 0xFFFFFFFF)
    traces_cur, traces_best = [], []
    start = 0
    while start < T:
        n = min(sweeps_per_chunk, T - start)
        S, E, bestS, bestE, trace = _fat_chunk(
            J_dev,
            field_dev,
            S,
            E,
            bestS,
            bestE,
            jnp.asarray(betas[start : start + n], dtype=jnp.float32),
            seed32,
            jnp.int32(start * plan.num_colors),
            offsets=plan.offsets,
            num_sweeps=n,
            track_trace=track_trace,
        )
        if track_trace:
            traces_cur.append(np.asarray(trace[0]))
            traces_best.append(np.asarray(trace[1]))
        start += n

    def unreorder(words: np.ndarray) -> np.ndarray:
        signs_blocked = _unpack_words(words, Kp)  # (R, Kp) class-major
        out = np.empty((R, K), dtype=np.float64)
        real = plan.perm != K
        out[:, plan.perm[real]] = signs_blocked[:, real]
        return out

    if need_final:
        words2, E_h, bestE_h = jax.device_get((_pack_two(S, bestS), E, bestE))
        S_out = unreorder(words2[0])
        best_out = unreorder(words2[1])
    else:
        words, E_h, bestE_h = jax.device_get((_pack_device(bestS), E, bestE))
        S_out = None
        best_out = unreorder(words)

    trace = (
        (np.concatenate(traces_cur), np.concatenate(traces_best))
        if track_trace
        else None
    )
    return (
        S_out,
        np.asarray(E_h, dtype=np.float64),
        best_out,
        np.asarray(bestE_h, dtype=np.float64),
        trace,
    )
