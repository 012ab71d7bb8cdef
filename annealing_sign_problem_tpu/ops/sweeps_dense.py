"""Dense MXU Metropolis engine for small/medium Ising models.

Replaces the neighbour-gather engine (sweeps_xla.py) in the regime where
the densified coupling tensor fits the relay's ~1.5 GB per-program buffer
cap (solvers/sa.py DENSE_BYTES_LIMIT: K up to ~2e4 at f32 — kagome-16 /
j1j2 / SK-16 full bases and the bench workload). Rationale, measured on a
v5e chip (kagome-16 full basis, K=12870, R=1024):

- the XLA row-gather S[nbr_ids] reaches ~13% of HBM peak and is ~50% of
  sweep time (12.2 -> 6.0 ms/sweep with the gather removed);
- Mosaic (jax 0.9) cannot lower a sublane gather inside Pallas, so a
  VMEM-resident sparse kernel is not expressible;
- reformulating the color-class update as a dense (M, Kp) @ (Kp, R)
  matmul removes every gather/scatter: spins are reordered block-major,
  so reading the current block and writing the flips are contiguous
  dynamic slices, and the local fields come off the systolic array.
  Measured 3.7e9 attempted flips/s (~70% of bf16 MXU peak) vs 1.1-1.5e9
  for the gather engine on the same problem.

The sweep semantics are identical to sweeps_xla (same greedy coloring,
one Metropolis attempt per spin per sweep, exact product-kernel updates
within a color class; reference annealer surface: ising_glass_annealer,
SURVEY §2.3). bf16 couplings carry ~3 significant digits — convergence
statistics are validated against the reference curves in tests and bench.

Long runs are split into bounded dispatches (the reference schedule goes
to 204800 sweeps; the device link tolerates only a few seconds per
dispatch), with the replica state carried on-device between calls.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sweeps_xla import ColorPlan, make_color_plan, _pack_words_host, _unpack_words

__all__ = ["DensePlan", "make_dense_plan", "run_annealing_dense", "dense_plan_bytes"]


@dataclass(frozen=True)
class DensePlan:
    """Block-major dense coupling layout for the MXU engine."""

    J: np.ndarray  # (NB, M, Kp) float32 (device copy cast to j_dtype)
    field: np.ndarray  # (NB, M) float32
    perm: np.ndarray  # (Kp,) reordered row -> original spin id (K = sentinel)
    num_spins: int  # K
    num_colors: int
    # "float32" (default: converged replicas land on the true optimum) or
    # "bfloat16" (halves the J + state footprint — the fused-trials curve
    # runs at R ~ 1e4 need it to stay under the relay's per-program buffer
    # cap; exactness is restored by the sparse-f32 descent phase)
    j_dtype: str = "float32"

    @property
    def num_blocks(self) -> int:
        return self.J.shape[0]

    @property
    def block_size(self) -> int:
        return self.J.shape[1]

    @property
    def padded_size(self) -> int:
        return self.J.shape[2]

    def device_arrays(self):
        """Device-resident (J f32, field f32), uploaded once per plan.

        J stays f32: bf16 couplings (~0.4% rounding) make converged
        replicas land on the bf16-optimum instead of the true one, so the
        reference's residual-energy criterion (|dE/E| <= 1e-12,
        full_hilbert_space.py:170) never fires. Measured wall time on the
        MXU is identical for f32 and bf16 J at these shapes.

        The upload is hundreds of MB and the host->device link can be the
        slow path; every anneal over the same plan reuses the buffers.
        """
        cached = getattr(self, "_device", None)
        if cached is None:
            dt = jnp.bfloat16 if self.j_dtype == "bfloat16" else jnp.float32
            cached = (
                jnp.asarray(self.J, dtype=dt),
                jnp.asarray(self.field),
            )
            object.__setattr__(self, "_device", cached)
        return cached


def dense_plan_bytes(num_spins: int, block_size: int = 256) -> int:
    """Estimated device bytes for the f32 dense coupling tensor (assumes
    ~8 blocks of color-class padding; use :func:`dense_plan_bytes_exact`
    with a computed coloring when the decision matters)."""
    kp = ((num_spins + block_size - 1) // block_size + 8) * block_size
    return 4 * kp * kp


def dense_plan_bytes_exact(
    colors: np.ndarray,
    num_spins: int,
    block_size: int = 256,
    bucket: bool = False,
) -> int:
    """Exact device bytes of the (NB*M, NB*M) f32 coupling tensor that
    :func:`make_dense_plan` would build for this coloring — each color
    class pads separately, so high-color models exceed the 8-block
    estimate of :func:`dense_plan_bytes`."""
    from ..solvers.coloring import color_classes
    from .sweeps_xla import _next_bucket

    K = int(num_spins)
    Kp = _next_bucket(K, 256) if bucket else K
    nb = sum(
        -(-len(cls) // block_size) for cls in color_classes(np.asarray(colors))
    )
    nb += -(-(Kp - K) // block_size)  # bucketed isolated-padding blocks
    if bucket:
        nb = _next_bucket(nb, 1)
    kp = nb * block_size
    return 4 * kp * kp


def make_dense_plan(
    hamiltonian,
    block_size: int = 256,
    colors: Optional[np.ndarray] = None,
    bucket: bool = False,
    j_dtype: str = "float32",
) -> DensePlan:
    """Densify a ColorPlan into the block-major layout.

    Spins are permuted so each update block is a contiguous row range;
    J[b, m, :] holds the couplings of block b's m-th spin against every
    *reordered* spin, so the local fields of a block are one matmul and
    the state update is a contiguous dynamic slice. ``bucket=True`` pads
    the block count to a power of two (see make_color_plan) so streams of
    heterogeneous clusters hit a bounded set of compiled kernel shapes.
    """
    plan = make_color_plan(
        hamiltonian, block_size=block_size, colors=colors, bucket=bucket
    )
    NB, M = plan.block_spins.shape
    Kp = NB * M
    K = plan.num_spins
    perm = plan.block_spins.reshape(-1).astype(np.int64)  # reordered -> orig
    inv = np.full(K + 1, Kp, dtype=np.int64)  # orig -> reordered
    real = perm != K
    inv[perm[real]] = np.nonzero(real)[0]

    J = np.zeros((Kp, Kp + 1), dtype=np.float32)  # last col absorbs sentinels
    D = plan.neighbours.shape[1]
    rows = np.repeat(np.arange(Kp), D)
    nbr = plan.neighbours[perm].reshape(-1)
    w = plan.couplings[perm].reshape(-1).astype(np.float32)
    J[rows, inv[nbr]] = w
    field = plan.field[perm].astype(np.float32)
    return DensePlan(
        J=np.ascontiguousarray(J[:, :Kp].reshape(NB, M, Kp)),
        field=field.reshape(NB, M),
        perm=perm,
        num_spins=K,
        num_colors=plan.num_colors,
        j_dtype=j_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "track_trace", "rng_impl"),
)
def _dense_chunk(
    J: jax.Array,  # (NB, M, Kp) bf16
    field: jax.Array,  # (NB, M) f32
    S: jax.Array,  # (Kp, R) bf16 ±1 (carried on device between chunks)
    E: jax.Array,  # (R,) f64
    bestS: jax.Array,  # (Kp, R) bf16
    bestE: jax.Array,  # (R,) f64
    betas: jax.Array,  # (num_sweeps,) f32
    seed: jax.Array,  # () uint32
    step0: jax.Array,  # () int32 — global step offset for the PRNG stream
    num_sweeps: int,
    track_trace: bool,
    rng_impl: str = "threefry",
):
    NB, M, Kp = J.shape
    R = S.shape[1]
    base_key = jax.random.PRNGKey(seed)

    def block_step(carry, inputs):
        S, E = carry
        beta, step_index = inputs
        b = step_index % NB
        local = jnp.dot(J[b], S, preferred_element_type=jnp.float32)  # (M, R)
        s_cur = jax.lax.dynamic_slice(S, (b * M, 0), (M, R))
        s_f = s_cur.astype(jnp.float32)
        delta = -2.0 * s_f * (2.0 * local + field[b][:, None])
        if rng_impl == "philox":
            # hardware-friendly counter RNG: one XLA RngBitGenerator per
            # block step, keyed on (seed, step) so streams stay
            # reproducible across chunk boundaries (threefry's fold_in +
            # uniform costs ~10% of the sweep on the MXU engine)
            k = jnp.stack(
                [seed, jnp.uint32(0x9E3779B9), jnp.uint32(0),
                 step_index.astype(jnp.uint32)]
            )
            _, bits = jax.lax.rng_bit_generator(k, (M, R), dtype=jnp.uint32)
            # top 24 bits only: exact in f32 and stays in [0, 1) — a full
            # 32-bit cast rounds-to-nearest and can land exactly on 1.0
            u = (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
                1.0 / (1 << 24)
            )
        else:
            key = jax.random.fold_in(base_key, step_index)
            u = jax.random.uniform(key, (M, R), dtype=jnp.float32)
        # zero-delta moves are REJECTED: spins with no couplings (exactly
        # zero-amplitude basis states are isolated Ising vertices —
        # kagome-18 has 9.9% of them) keep their initial signs, the only
        # convention under which sign accuracy on them is meaningful
        accept = (delta != 0) & ((delta < 0) | (u < jnp.exp(-beta * delta)))
        S = jax.lax.dynamic_update_slice(
            S, jnp.where(accept, -s_cur, s_cur), (b * M, 0)
        )
        E = E + jnp.sum(jnp.where(accept, delta, 0.0), axis=0, dtype=jnp.float64)
        return (S, E), None

    def sweep(carry, inputs):
        S, E, bestS, bestE = carry
        beta, sweep_index = inputs
        steps = step0 + sweep_index * NB + jnp.arange(NB)
        (S, E), _ = jax.lax.scan(block_step, (S, E), (jnp.full(NB, beta), steps))
        better = E < bestE
        bestE = jnp.where(better, E, bestE)
        bestS = jnp.where(better[None, :], S, bestS)
        out = (E, bestE) if track_trace else None
        return (S, E, bestS, bestE), out

    (S, E, bestS, bestE), trace = jax.lax.scan(
        sweep, (S, E, bestS, bestE), (betas, jnp.arange(num_sweeps))
    )
    return S, E, bestS, bestE, trace


@functools.partial(jax.jit, static_argnames=("num_spins",))
def _dense_init(J, field, init_words, num_spins: int):
    """Unpack the packed upload into the reordered (Kp, R) ±1 state and
    compute exact initial energies."""
    NB, M, Kp = J.shape
    W, R = init_words.shape
    K = num_spins
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    bits = ((init_words[:, None, :] >> shifts) & 1).reshape(W * 32, R)[:Kp]
    S = (2 * bits.astype(jnp.int32) - 1).astype(J.dtype)  # (Kp, R), J's dtype

    def energy_block(E, b):
        local = jnp.dot(J[b], S, preferred_element_type=jnp.float32)
        s_f = jax.lax.dynamic_slice(S, (b * M, 0), (M, R)).astype(jnp.float32)
        contrib = s_f * (local + field[b][:, None])
        return E + jnp.sum(contrib, axis=0, dtype=jnp.float64), None

    E, _ = jax.lax.scan(energy_block, jnp.zeros(R, dtype=jnp.float64), jnp.arange(NB))
    return S, E


@functools.partial(jax.jit, static_argnames=())
def _pack_device(S: jax.Array) -> jax.Array:
    """(Kp, R) ±1 -> (W, R) packed uint32 on device (32x smaller download)."""
    Kp, R = S.shape
    W = (Kp + 31) // 32
    padded = jnp.zeros((W * 32, R), dtype=jnp.uint32)
    padded = padded.at[:Kp].set((S > 0).astype(jnp.uint32))
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    return jnp.sum(padded.reshape(W, 32, R) << shifts, axis=1, dtype=jnp.uint32)


@jax.jit
def _pack_two(S: jax.Array, bestS: jax.Array) -> jax.Array:
    """Pack final and best states in one dispatch (the relay charges a
    round-trip per dispatch, so fewer, fatter calls win)."""
    return jnp.stack([_pack_device(S), _pack_device(bestS)])


def run_annealing_dense(
    plan: DensePlan,
    x0_signs: np.ndarray,  # (R, K) ±1
    betas: np.ndarray,  # (T,)
    seed: int,
    track_trace: bool = False,
    sweeps_per_chunk: Optional[int] = None,
    need_final: bool = True,
    rng_impl: str = "threefry",
) -> Tuple[Optional[np.ndarray], np.ndarray, np.ndarray, np.ndarray, Optional[tuple]]:
    """Run T sweeps on the dense MXU engine, chunked into bounded
    dispatches with the replica state held on device between chunks.

    Returns (final signs (R, K) or None, final energies (R,), best signs
    (R, K), best energies (R,), optional (current, best) energy traces
    (T, R)). ``need_final=False`` skips packing/downloading the final
    state (callers typically keep only the best snapshot).
    """
    R, K0 = x0_signs.shape
    K = plan.num_spins
    assert K0 <= K
    if K0 < K:  # bucketed plan: padding spins start at +1 (isolated, inert)
        x0_signs = np.concatenate(
            [x0_signs, np.ones((R, K - K0), dtype=x0_signs.dtype)], axis=1
        )
    NB, M, Kp = plan.J.shape
    T = len(betas)
    if sweeps_per_chunk is None:
        # target ~4s of device time per dispatch (the relay kills longer
        # ones); the engine sustains roughly 8e13 matmul FLOP/s
        flops_per_sweep = 2.0 * NB * M * Kp * R
        sweeps_per_chunk = int(min(max(4.0 * 8e13 / flops_per_sweep, 16), 8192))

    # reorder the initial signs into block-major rows; sentinel rows +1
    ext = np.ones((K + 1, R), dtype=np.float64)
    ext[:K] = x0_signs.T
    S_host = ext[plan.perm]  # (Kp, R)

    J_dev, field_dev = plan.device_arrays()
    words = _pack_words_host(np.ascontiguousarray(S_host.T))
    S, E = _dense_init(J_dev, field_dev, jnp.asarray(words), K)
    bestS, bestE = S, E

    seed32 = jnp.uint32(seed & 0xFFFFFFFF)
    traces_cur, traces_best = [], []
    start = 0
    while start < T:
        n = min(sweeps_per_chunk, T - start)
        S, E, bestS, bestE, trace = _dense_chunk(
            J_dev,
            field_dev,
            S,
            E,
            bestS,
            bestE,
            jnp.asarray(betas[start : start + n], dtype=jnp.float32),
            seed32,
            jnp.int32(start * NB),
            num_sweeps=n,
            track_trace=track_trace,
            rng_impl=rng_impl,
        )
        if track_trace:
            traces_cur.append(np.asarray(trace[0]))
            traces_best.append(np.asarray(trace[1]))
        start += n

    def unreorder(words: np.ndarray) -> np.ndarray:
        signs_blocked = _unpack_words(words, Kp)  # (R, Kp) in block-major order
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
