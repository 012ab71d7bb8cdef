"""Replica-parallel Metropolis sweeps on TPU (XLA engine).

The annealing hot loop that replaces the reference's native CPU annealer
(``ising_glass_annealer``; SURVEY §2.3). Design:

- The interaction graph is greedily colored; spins of one color are
  mutually non-adjacent, so a simultaneous Metropolis update of a color
  class is an exact product of independent single-site kernels. One sweep
  = one pass over all color classes = every spin attempted exactly once,
  giving sequential-quality mixing with fully vectorised updates.
- Color classes are split into fixed-size update blocks so the working set
  (a ``(block, degree, replicas)`` gather) stays small and shapes are
  static for XLA.
- State is replica-major on the *lane* axis: signs live in a
  ``(K+1, R)`` array (sentinel row K pinned at 0 absorbs padding), so the
  neighbour gather reads contiguous rows and the scatter writes contiguous
  rows — both stream at HBM bandwidth.
- Energies are tracked incrementally per replica; per-sweep best-state
  snapshots implement the annealer's ``only_best`` reduction, which
  extends across chips with a simple ``pmin`` over a mesh axis
  (parallel/mesh.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ColorPlan", "make_color_plan", "run_annealing"]


@dataclass(frozen=True)
class ColorPlan:
    """Static sweep schedule: update blocks + padded neighbour lists."""

    block_spins: np.ndarray  # (NB, M) int32, sentinel = K
    neighbours: np.ndarray  # (K+1, D) int32, sentinel row points at K
    couplings: np.ndarray  # (K+1, D) float
    field: np.ndarray  # (K+1,)
    num_spins: int  # K
    num_colors: int

    @property
    def num_blocks(self) -> int:
        return self.block_spins.shape[0]

    @property
    def block_size(self) -> int:
        return self.block_spins.shape[1]

    def device_arrays(self):
        """Device-resident (block_spins, neighbours, couplings f32,
        field f32), uploaded once per plan and reused across anneals."""
        cached = getattr(self, "_device", None)
        if cached is None:
            cached = (
                jnp.asarray(self.block_spins),
                jnp.asarray(self.neighbours),
                jnp.asarray(self.couplings, dtype=jnp.float32),
                jnp.asarray(self.field, dtype=jnp.float32),
            )
            object.__setattr__(self, "_device", cached)
        return cached


def _next_bucket(n: int, minimum: int = 1) -> int:
    """Next power of two >= max(n, minimum)."""
    return max(minimum, 1 << max(int(n) - 1, 0).bit_length())


def make_color_plan(
    hamiltonian,
    block_size: int = 512,
    colors: Optional[np.ndarray] = None,
    bucket: bool = False,
) -> ColorPlan:
    """Build the static sweep schedule for an IsingHamiltonian.

    ``bucket=True`` pads every shape (spin count, neighbour width, block
    count) to the next power of two with inert sentinels, so a stream of
    heterogeneous cluster models compiles O(log) distinct kernels instead
    of one per cluster (remote TPU compiles cost 40s+ each; the cluster
    pipeline solves thousands of models, sampled_connected_components.py).
    Padding spins are isolated (zero couplings/field); ``num_spins``
    reports the padded count — callers slice results back.
    """
    from ..solvers.coloring import greedy_coloring, color_classes

    K = hamiltonian.size
    Kp = _next_bucket(K, 256) if bucket else K
    if colors is None:
        colors = greedy_coloring(hamiltonian.exchange)
    classes = color_classes(colors)

    blocks: List[np.ndarray] = []
    for cls in classes:
        for s in range(0, len(cls), block_size):
            chunk = cls[s : s + block_size]
            if len(chunk) < block_size:
                chunk = np.concatenate(
                    [chunk, np.full(block_size - len(chunk), Kp, dtype=np.int32)]
                )
            blocks.append(chunk.astype(np.int32))
    # padding spins [K, Kp) are isolated but still get one Metropolis
    # attempt per sweep so per-sweep semantics stay uniform
    for s in range(K, Kp, block_size):
        chunk = np.arange(s, s + block_size, dtype=np.int32)
        blocks.append(np.where(chunk < Kp, chunk, Kp))
    NB = len(blocks)
    NBp = _next_bucket(NB, 1) if bucket else max(NB, 1)
    while len(blocks) < NBp:
        blocks.append(np.full(block_size, Kp, dtype=np.int32))
    block_spins = np.stack(blocks) if blocks else np.zeros((0, block_size), np.int32)

    # padded neighbour lists (off-diagonal only), sentinel row Kp
    m = hamiltonian.exchange.tocoo()
    mask = (m.row != m.col) & (m.data != 0.0)
    src, dst, w = m.row[mask], m.col[mask], m.data[mask]
    counts = np.bincount(src, minlength=K)
    D = max(int(counts.max()) if counts.size else 0, 1)
    if bucket:
        D = _next_bucket(D, 4)
    nbr = np.full((Kp + 1, D), Kp, dtype=np.int32)
    val = np.zeros((Kp + 1, D), dtype=np.float64)
    offsets = np.zeros(K + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    order = np.argsort(src, kind="stable")
    src, dst, w = src[order], dst[order], w[order]
    slot = np.arange(len(src)) - offsets[src]
    nbr[src, slot] = dst
    val[src, slot] = w

    field = np.zeros(Kp + 1, dtype=np.float64)
    field[:K] = hamiltonian.field

    return ColorPlan(
        block_spins=block_spins,
        neighbours=nbr,
        couplings=val,
        field=field,
        num_spins=Kp,
        num_colors=int(colors.max()) + 1 if K else 0,
    )


@functools.partial(jax.jit, static_argnames=("num_spins", "dtype"))
def _sparse_init(
    block_spins, neighbours, couplings, field, init_words, num_spins: int, dtype
):
    """Unpack the packed upload into the (K+1, R) working state and compute
    exact initial energies block-by-block (bounded working set):
    E = sum_i s_i * (sum_j J_ij s_j + h_i) with both triangles stored."""
    NB, M = block_spins.shape
    W, R = init_words.shape
    K = num_spins
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    bits = ((init_words[:, None, :] >> shifts) & 1).reshape(W * 32, R)[:K]
    signs0 = jnp.zeros((K + 1, R), dtype=dtype)
    signs0 = signs0.at[:K].set((2 * bits.astype(jnp.int32) - 1).astype(dtype))

    def energy_block(E, b):
        ids = block_spins[b]
        nbr_ids = neighbours[ids].reshape(-1)
        Sn = signs0[nbr_ids].reshape(M, -1, R).astype(jnp.float32)
        local = jnp.einsum("mdr,md->mr", Sn, couplings[ids])
        contrib = signs0[ids].astype(jnp.float32) * (local + field[ids][:, None])
        return E + jnp.sum(contrib, axis=0, dtype=jnp.float64), None

    E0, _ = jax.lax.scan(energy_block, jnp.zeros(R, dtype=jnp.float64), jnp.arange(NB))
    return signs0, E0


@functools.partial(
    jax.jit,
    static_argnames=("num_sweeps", "track_trace"),
)
def _sparse_chunk(
    block_spins: jax.Array,  # (NB, M) int32
    neighbours: jax.Array,  # (K+1, D) int32
    couplings: jax.Array,  # (K+1, D) f32
    field: jax.Array,  # (K+1,) f32
    S: jax.Array,  # (K+1, R) ±1, carried on device between chunks
    E: jax.Array,  # (R,) f64
    bestS: jax.Array,
    bestE: jax.Array,
    betas: jax.Array,  # (num_sweeps,) f32
    seed: jax.Array,  # () uint32
    step0: jax.Array,  # () int32 — global step offset for the PRNG stream
    num_sweeps: int,
    track_trace: bool,
):
    NB, M = block_spins.shape
    R = S.shape[1]
    base_key = jax.random.PRNGKey(seed)

    def block_step(carry, inputs):
        S, E = carry
        beta, step_index = inputs
        ids = block_spins[step_index % NB]  # (M,)
        nbr_ids = neighbours[ids].reshape(-1)  # (M*D,)
        # the gather is the HBM-bound hot spot: bf16 state halves its traffic
        Sn = S[nbr_ids].reshape(M, -1, R).astype(jnp.float32)  # (M, D, R)
        w = couplings[ids]  # (M, D)
        local = jnp.einsum("mdr,md->mr", Sn, w)  # (M, R)
        s_cur = S[ids]  # (M, R)
        delta = -2.0 * s_cur.astype(jnp.float32) * (2.0 * local + field[ids][:, None])
        key = jax.random.fold_in(base_key, step_index)
        u = jax.random.uniform(key, (M, R), dtype=jnp.float32)
        # zero-delta moves rejected: isolated (zero-amplitude) spins keep
        # their initial signs — see sweeps_dense.py
        accept = (delta != 0) & ((delta < 0) | (u < jnp.exp(-beta * delta)))
        S = S.at[ids].set(jnp.where(accept, -s_cur, s_cur))
        # energy bookkeeping in f64: tiny (R,) arrays, keeps the best-state
        # selection honest over hundreds of thousands of sweeps
        E = E + jnp.sum(jnp.where(accept, delta, 0.0), axis=0, dtype=jnp.float64)
        return (S, E), None

    def sweep(carry, inputs):
        S, E, bestS, bestE = carry
        beta, sweep_index = inputs
        steps = step0 + sweep_index * NB + jnp.arange(NB)
        (S, E), _ = jax.lax.scan(
            block_step, (S, E), (jnp.full(NB, beta), steps)
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


@jax.jit
def _pack_device(S: jax.Array) -> jax.Array:
    """(K+1, R) ±1 -> (W, R) packed uint32 on device: transfers back to the
    host shrink 32x (the tunnel to the TPU is the slow path)."""
    Kp1, R = S.shape
    K = Kp1 - 1
    W = (K + 31) // 32
    padded = jnp.zeros((W * 32, R), dtype=jnp.uint32)
    padded = padded.at[:K].set((S[:K] > 0).astype(jnp.uint32))
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    return jnp.sum(padded.reshape(W, 32, R) << shifts, axis=1, dtype=jnp.uint32)


@jax.jit
def _pack_two(S: jax.Array, bestS: jax.Array) -> jax.Array:
    """Pack final and best states in one dispatch (the relay charges a
    round-trip per dispatch, so fewer, fatter calls win)."""
    return jnp.stack([_pack_device(S), _pack_device(bestS)])


def _unpack_words(words: np.ndarray, K: int) -> np.ndarray:
    """(W, R) uint32 words -> (R, K) ±1 float64 on the host."""
    W, R = words.shape
    bits = (
        (words[:, None, :] >> np.arange(32, dtype=np.uint32)[None, :, None]) & 1
    ).reshape(W * 32, R)[:K]
    return (2.0 * bits.astype(np.float64) - 1.0).T


def _pack_words_host(signs: np.ndarray) -> np.ndarray:
    """(R, K) ±1 -> (W, R) uint32 packed words on the host (vectorised)."""
    R, K = signs.shape
    W = (K + 31) // 32
    bits = np.zeros((W * 32, R), dtype=np.uint32)
    bits[:K] = (signs.T > 0).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)[None, :, None]
    return (bits.reshape(W, 32, R) << shifts).sum(axis=1, dtype=np.uint32)


def run_annealing(
    plan: ColorPlan,
    x0_signs: np.ndarray,  # (R, K) ±1
    betas: np.ndarray,  # (T,)
    seed: int,
    dtype=jnp.bfloat16,
    track_trace: bool = False,
    sweeps_per_chunk: Optional[int] = None,
    need_final: bool = True,
) -> Tuple[Optional[np.ndarray], np.ndarray, np.ndarray, np.ndarray, Optional[tuple]]:
    """Run T sweeps of replica-parallel annealing, chunked into bounded
    dispatches with the replica state held on device between chunks.

    Returns (final signs (R, K) or None, final energies (R,), best signs
    (R, K), best energies (R,), optional (current, best) energy traces
    (T, R)). ``need_final=False`` skips the final-state download.
    All device traffic is bit-packed (W uint32 words per replica), so the
    host<->device path moves K*R/32 words instead of K*R floats.
    """
    R, K0 = x0_signs.shape
    K = plan.num_spins
    assert K0 <= K
    if K0 < K:  # bucketed plan: padding spins start at +1 (isolated, inert)
        x0_signs = np.concatenate(
            [x0_signs, np.ones((R, K - K0), dtype=x0_signs.dtype)], axis=1
        )
    T = len(betas)
    if sweeps_per_chunk is None:
        # target ~4s of device time per dispatch; the gather engine moves
        # ~K*D*R*itemsize bytes per sweep at a few hundred GB/s effective
        flips_per_sweep = float(K) * R
        sweeps_per_chunk = int(min(max(4.0 * 1.5e9 / flips_per_sweep, 16), 8192))

    block_spins, neighbours, couplings, field = plan.device_arrays()

    S, E = _sparse_init(
        block_spins,
        neighbours,
        couplings,
        field,
        jnp.asarray(_pack_words_host(x0_signs)),
        num_spins=K,
        dtype=dtype,
    )
    bestS, bestE = S, E
    seed32 = jnp.uint32(seed & 0xFFFFFFFF)
    traces_cur, traces_best = [], []
    start = 0
    while start < T:
        n = min(sweeps_per_chunk, T - start)
        S, E, bestS, bestE, trace = _sparse_chunk(
            block_spins,
            neighbours,
            couplings,
            field,
            S,
            E,
            bestS,
            bestE,
            jnp.asarray(betas[start : start + n], dtype=jnp.float32),
            seed32,
            jnp.int32(start * plan.num_blocks),
            num_sweeps=n,
            track_trace=track_trace,
        )
        if track_trace:
            traces_cur.append(np.asarray(trace[0]))
            traces_best.append(np.asarray(trace[1]))
        start += n

    if need_final:
        words2, E_h, bestE_h = jax.device_get((_pack_two(S, bestS), E, bestE))
        S_out = _unpack_words(words2[0], K)
        bestS_out = _unpack_words(words2[1], K)
    else:
        words, E_h, bestE_h = jax.device_get((_pack_device(bestS), E, bestE))
        S_out = None
        bestS_out = _unpack_words(words, K)
    trace = (
        (np.concatenate(traces_cur), np.concatenate(traces_best))
        if track_trace
        else None
    )
    return S_out, np.asarray(E_h, np.float64), bestS_out, np.asarray(bestE_h, np.float64), trace
