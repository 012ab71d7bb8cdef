"""Multi-slab dense MXU Metropolis engine for medium Ising models.

Covers the regime between the single-buffer dense engine (sweeps_dense.py,
capped at K ~ 2e4 by the relay's ~1.5 GB per-program buffer limit) and the
HBM-gather engine (sweeps_xla.py, issue-rate-bound at ~1e8 flips/s): the
densified coupling tensor is split along the block axis into several
sub-cap slabs that stay RESIDENT on device, and one sweep runs as one
pipelined dispatch per slab. Measured on the relay, chained dependent
dispatches cost ~1 ms each while a slab's partial sweep is several ms of
MXU time, so the dispatch overhead hides behind compute.

Coverage: f32 couplings to K ~ 3.5e4, bf16 to K ~ 6e4 (HBM-resident J).
This is the engine for the kagome-18 full basis (K = 48,620) and for
kagome-36 order-2 extension clusters (K ~ 3.3e4), both of which
previously fell to the gather engine (VERDICT round 2, item 3).

Sweep semantics are identical to sweeps_dense.py: same greedy coloring,
block-major spin reorder, one Metropolis attempt per spin per sweep,
zero-delta moves rejected. Processing blocks slab-by-slab instead of in
color order is still an exact Metropolis chain — every update block lies
inside one color class, so simultaneous updates within a block are
independent, and blocks themselves are applied sequentially in a fixed
(arbitrary) order. Reference annealer surface: ising_glass_annealer,
SURVEY §2.3; solver dispatch common.py:232-261.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sweeps_dense import DensePlan, make_dense_plan, _pack_device
from .sweeps_xla import _pack_words_host, _unpack_words

__all__ = ["SlabPlan", "make_slab_plan", "run_annealing_slab", "slab_plan_bytes"]

# keep each slab's per-program footprint (J slab + state + best state)
# under the relay's ~1.5 GB RESOURCE_EXHAUSTED threshold
DEFAULT_SLAB_BYTES = 1 << 30


@dataclass(frozen=True)
class SlabPlan:
    """Block-major dense couplings split into resident sub-cap slabs."""

    J: np.ndarray  # (NB, M, Kp) float32 (host master copy)
    field: np.ndarray  # (NB, M) float32
    perm: np.ndarray  # (Kp,) reordered row -> original spin id (K = sentinel)
    num_spins: int  # K
    num_colors: int
    slab_starts: Tuple[int, ...]  # block index where each slab begins
    j_dtype: str = "float32"  # "float32" | "bfloat16"

    @property
    def num_blocks(self) -> int:
        return self.J.shape[0]

    @property
    def block_size(self) -> int:
        return self.J.shape[1]

    @property
    def padded_size(self) -> int:
        return self.J.shape[2]

    @property
    def num_slabs(self) -> int:
        return len(self.slab_starts)

    def slab_spans(self) -> List[Tuple[int, int]]:
        starts = list(self.slab_starts) + [self.num_blocks]
        return [(starts[i], starts[i + 1]) for i in range(self.num_slabs)]

    def device_arrays(self):
        """Per-slab device-resident (J, field) tuples, uploaded once."""
        cached = getattr(self, "_device", None)
        if cached is None:
            dt = jnp.bfloat16 if self.j_dtype == "bfloat16" else jnp.float32
            cached = tuple(
                (
                    jnp.asarray(self.J[s:e], dtype=dt),
                    jnp.asarray(self.field[s:e]),
                )
                for s, e in self.slab_spans()
            )
            object.__setattr__(self, "_device", cached)
        return cached


def slab_plan_bytes(num_spins: int, block_size: int = 256, j_dtype: str = "float32") -> int:
    """Rough resident-HBM estimate for the full sliced coupling tensor."""
    kp = ((num_spins + block_size - 1) // block_size + 16) * block_size
    return (2 if j_dtype == "bfloat16" else 4) * kp * kp


def make_slab_plan(
    hamiltonian,
    block_size: int = 256,
    colors: Optional[np.ndarray] = None,
    bucket: bool = False,
    slab_bytes: int = DEFAULT_SLAB_BYTES,
    j_dtype: str = "float32",
) -> SlabPlan:
    """Build the dense block-major layout (make_dense_plan) and split the
    block axis into slabs of at most ``slab_bytes`` device bytes each."""
    base: DensePlan = make_dense_plan(
        hamiltonian, block_size=block_size, colors=colors, bucket=bucket
    )
    NB, M, Kp = base.J.shape
    itemsize = 2 if j_dtype == "bfloat16" else 4
    bytes_per_block = M * Kp * itemsize
    blocks_per_slab = max(int(slab_bytes // bytes_per_block), 1)
    starts = tuple(range(0, NB, blocks_per_slab))
    return SlabPlan(
        J=base.J,
        field=base.field,
        perm=base.perm,
        num_spins=base.num_spins,
        num_colors=base.num_colors,
        slab_starts=starts,
        j_dtype=j_dtype,
    )


@functools.partial(jax.jit, static_argnames=("nb", "do_best"), donate_argnums=(2, 3, 4, 5))
def _slab_pass(
    J: jax.Array,  # (nb, M, Kp) f32/bf16 — resident slab
    field: jax.Array,  # (nb, M) f32
    S: jax.Array,  # (Kp, R) bf16 ±1 (donated, carried across dispatches)
    E: jax.Array,  # (R,) f64 (donated)
    bestS: jax.Array,  # (Kp, R) bf16 (donated)
    bestE: jax.Array,  # (R,) f64 (donated)
    beta: jax.Array,  # () f32 — this sweep's inverse temperature
    seed: jax.Array,  # () uint32
    step0: jax.Array,  # () int32 — global (sweep, block) PRNG offset
    block0: jax.Array,  # () int32 — first reordered row of this slab / M
    nb: int,
    do_best: bool,
):
    """One partial sweep: Metropolis-update every block of this slab."""
    _, M, Kp = J.shape
    R = S.shape[1]
    base_key = jax.random.PRNGKey(seed)

    def block_step(carry, b):
        S, E = carry
        # S carries the SAME dtype as J (set by _slab_init) so the matmul
        # needs no per-block full-state cast
        local = jnp.dot(J[b], S, preferred_element_type=jnp.float32)  # (M, R)
        row = (block0 + b) * M
        s_cur = jax.lax.dynamic_slice(S, (row, 0), (M, R))
        s_f = s_cur.astype(jnp.float32)
        delta = -2.0 * s_f * (2.0 * local + field[b][:, None])
        key = jax.random.fold_in(base_key, step0 + b)
        u = jax.random.uniform(key, (M, R), dtype=jnp.float32)
        # zero-delta moves rejected (isolated spins keep their signs)
        accept = (delta != 0) & ((delta < 0) | (u < jnp.exp(-beta * delta)))
        S = jax.lax.dynamic_update_slice(S, jnp.where(accept, -s_cur, s_cur), (row, 0))
        E = E + jnp.sum(jnp.where(accept, delta, 0.0), axis=0, dtype=jnp.float64)
        return (S, E), None

    (S, E), _ = jax.lax.scan(block_step, (S, E), jnp.arange(nb))
    if do_best:  # last slab of the sweep: refresh the best-of-chain snapshot
        better = E < bestE
        bestE = jnp.where(better, E, bestE)
        bestS = jnp.where(better[None, :], S, bestS)
    return S, E, bestS, bestE


@functools.partial(jax.jit, static_argnames=("num_spins", "dtype"))
def _slab_init(init_words, num_spins: int, dtype):
    """Unpack packed x0 into the (Kp, R) ±1 state (same dtype as J, so
    the per-block matmuls need no cast)."""
    Kp = num_spins
    W, R = init_words.shape
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
    bits = ((init_words[:, None, :] >> shifts) & 1).reshape(W * 32, R)[:Kp]
    return (2 * bits.astype(jnp.int32) - 1).astype(dtype)


def run_annealing_slab(
    plan: SlabPlan,
    x0_signs: np.ndarray,  # (R, K) ±1
    betas: np.ndarray,  # (T,)
    seed: int,
    energies0: Optional[np.ndarray] = None,  # (R,) exact f64 E(x0)
    sync_every: int = 2048,
    need_final: bool = True,
) -> Tuple[Optional[np.ndarray], np.ndarray, np.ndarray, np.ndarray, Optional[tuple]]:
    """Run T sweeps on the multi-slab engine.

    Every sweep enqueues one dispatch per slab; dispatches pipeline
    through the relay (~1 ms each, hidden behind the slab's MXU time).
    Returns (final signs (R, K) or None, final energies, best signs,
    best energies, None) matching run_annealing_dense. ``energies0``
    (exact initial energies of x0) lets the caller skip a full-tensor
    init program; if omitted they are computed with one extra pass of
    host-side dot products.
    """
    R, K0 = x0_signs.shape
    K = plan.num_spins
    assert K0 <= K
    if K0 < K:
        x0_signs = np.concatenate(
            [x0_signs, np.ones((R, K - K0), dtype=x0_signs.dtype)], axis=1
        )
    NB, M, Kp = plan.J.shape
    T = len(betas)

    # block-major reorder of the initial state; sentinel rows +1
    ext = np.ones((K + 1, R), dtype=np.float64)
    ext[:K] = x0_signs.T
    S_host = ext[plan.perm]  # (Kp, R)

    slabs = plan.device_arrays()
    spans = plan.slab_spans()
    words = _pack_words_host(np.ascontiguousarray(S_host.T))
    dt = jnp.bfloat16 if plan.j_dtype == "bfloat16" else jnp.float32
    S = _slab_init(jnp.asarray(words), Kp, dt)
    if energies0 is None:
        # exact initial energies via the block-major couplings, host side
        # (one-off O(Kp^2 R / slab) numpy work would be heavy; instead use
        # the identity E = sum_b s_b . (J_b s + h_b) accumulated per slab
        # on device with bounded footprint)
        E_acc = jnp.zeros((R,), dtype=jnp.float64)
        for (Jd, fd), (s0, e0) in zip(slabs, spans):
            E_acc = _slab_energy(Jd, fd, S, E_acc, jnp.int32(s0), nb=e0 - s0)
        E = E_acc
    else:
        E = jnp.asarray(energies0, dtype=jnp.float64)
    # independent buffers: every pass donates all four carries
    bestS, bestE = jnp.copy(S), jnp.copy(E)

    seed32 = jnp.uint32(seed & 0xFFFFFFFF)
    for t in range(T):
        beta = jnp.float32(betas[t])
        for si, ((Jd, fd), (s0, e0)) in enumerate(zip(slabs, spans)):
            S, E, bestS, bestE = _slab_pass(
                Jd, fd, S, E, bestS, bestE,
                beta, seed32,
                jnp.int32(t * NB + s0), jnp.int32(s0),
                nb=e0 - s0, do_best=(si == len(spans) - 1),
            )
        if sync_every and (t + 1) % sync_every == 0:
            E.block_until_ready()
            np.asarray(E[:1])  # bound the async queue through the relay

    def unreorder(words: np.ndarray) -> np.ndarray:
        signs_blocked = _unpack_words(words, Kp)  # (R, Kp) block-major
        out = np.empty((R, K), dtype=np.float64)
        real = plan.perm != K
        out[:, plan.perm[real]] = signs_blocked[:, real]
        return out

    if need_final:
        wF, wB, E_h, bestE_h = jax.device_get(
            (_pack_device(S), _pack_device(bestS), E, bestE)
        )
        S_out = unreorder(wF)
        best_out = unreorder(wB)
    else:
        wB, E_h, bestE_h = jax.device_get((_pack_device(bestS), E, bestE))
        S_out = None
        best_out = unreorder(wB)
    return (
        S_out,
        np.asarray(E_h, dtype=np.float64),
        best_out,
        np.asarray(bestE_h, dtype=np.float64),
        None,
    )


@functools.partial(jax.jit, static_argnames=("nb",), donate_argnums=(3,))
def _slab_energy(J, field, S, E, block0, nb: int):
    """Exact initial energies, accumulated one resident slab at a time:
    E += sum_{rows in slab} s_r * (J_r s + h_r)."""
    _, M, Kp = J.shape
    R = S.shape[1]

    def body(E, b):
        local = jnp.dot(J[b], S, preferred_element_type=jnp.float32)
        row = (block0 + b) * M
        s_f = jax.lax.dynamic_slice(S, (row, 0), (M, R)).astype(jnp.float32)
        contrib = s_f * (local + field[b][:, None])
        return E + jnp.sum(contrib, axis=0, dtype=jnp.float64), None

    E, _ = jax.lax.scan(body, E, jnp.arange(nb))
    return E
