"""Table-free ED over a full fixed-hamming-weight sector.

The sk_32_1 system (reference physical_systems/sk_32_1.yaml: 32 spins,
hamming weight 16, no symmetries) lives on the complete
C(32,16) = 601,080,390-state sector. The reference diagonalised it with
the external SpinED binary on a large CPU node (SURVEY L0). On one TPU
the enabling observation is that the sector basis needs NO stored state
table: numeric (ascending-uint64) order of bitmasks equals colexicographic
order of the set-bit combinations, so the basis index is the closed-form
combinadic rank

    rank(s) = sum_i C(p_i, i),   p_1 < p_2 < ... the set bit positions,

computable with 32 vector ops and a (n+1, k+1) binomial lookup — and its
inverse (unrank) is a greedy binomial subtraction. The Lanczos matvec
applies the operator's term tables on the fly (operator.apply_padded) and
gathers x at the ranked neighbours; memory is three sector vectors plus
an accumulator (~10 GB f32 at 601M), no neighbour table.

Orthogonality: a short two-pass restarted Lanczos (no stored V): pass 1
builds the m-step tridiagonal from the 3-term recurrence, pass 2 reruns
the recurrence to accumulate the lowest Ritz vector — the textbook
memory-bound variant (Parlett ch.13). Small m per restart keeps the
orthogonality loss harmless; the restart loop re-seeds from the running
best Ritz vector with the same regression guard as lanczos.py.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .operator import Operator
from .utils.log import logger

__all__ = [
    "binomial_table",
    "make_sector_codec",
    "sector_dimension",
    "ground_state_sector",
    "two_pass_lanczos",
]


def binomial_table(n: int, k: int) -> np.ndarray:
    """C(p, j) for p in [0, n], j in [0, k+1], int64 (values < 2^31 for
    the supported n <= 32 sectors, but built exactly)."""
    t = np.zeros((n + 1, k + 2), dtype=np.int64)
    t[:, 0] = 1
    for p in range(1, n + 1):
        for j in range(1, k + 2):
            t[p, j] = t[p - 1, j - 1] + t[p - 1, j]
    return t


def sector_dimension(n: int, k: int) -> int:
    return int(binomial_table(n, k)[n, k])


def make_sector_codec(n: int, k: int):
    """(rank_fn, unrank_fn) jitted device functions for the (n, k) sector.

    rank_fn: uint64 states (...,) -> int32 combinadic index;
    unrank_fn: int32 index (...,) -> uint64 state.
    """
    table = binomial_table(n, k)
    if table[n, k] >= (1 << 31):
        raise ValueError("sector dimension exceeds int32 indexing")
    d_table = jnp.asarray(table.astype(np.int32))  # (n+1, k+2)
    positions = jnp.arange(n, dtype=jnp.uint64)

    @jax.jit
    def rank_fn(states: jax.Array) -> jax.Array:
        states = jnp.asarray(states, dtype=jnp.uint64)
        bits = ((states[..., None] >> positions) & jnp.uint64(1)).astype(jnp.int32)
        ones = jnp.cumsum(bits, axis=-1)  # i-th set bit (1-based) at its position
        contrib = bits * d_table[jnp.arange(n), jnp.clip(ones, 0, k + 1)]
        return jnp.sum(contrib, axis=-1, dtype=jnp.int32)

    @jax.jit
    def unrank_fn(idx: jax.Array) -> jax.Array:
        idx = jnp.asarray(idx, dtype=jnp.int32)

        def body(carry, p):
            rem, j, state = carry
            c = d_table[p, j]
            take = (j > 0) & (rem >= c)
            rem = jnp.where(take, rem - c, rem)
            state = jnp.where(
                take, state | (jnp.uint64(1) << p.astype(jnp.uint64)), state
            )
            j = jnp.where(take, j - 1, j)
            return (rem, j, state), None

        shape = idx.shape
        flat = idx.reshape(-1)
        init = (
            flat,
            jnp.full(flat.shape, k, dtype=jnp.int32),
            jnp.zeros(flat.shape, dtype=jnp.uint64),
        )
        (rem, j, state), _ = jax.lax.scan(
            body, init, jnp.arange(n - 1, -1, -1, dtype=jnp.int32)
        )
        return state.reshape(shape)

    return rank_fn, unrank_fn


def _matvec_maker(
    operator: Operator,
    n: int,
    k: int,
    rows_per_chunk: int,
    chunks_per_dispatch: int,
    gather_mode: str = "element",
):
    """One bounded dispatch computes rows [start, start + B*G) of H @ x.

    ``gather_mode="element"`` issues one random 1-element gather per
    non-zero — latency-bound at ~5e7 gathers/s on the relay-attached
    v5e, which prices a 601M-state sk_32 matvec at ~50 min.
    ``"row128"`` is the same restructuring that made the kagome-36
    codebook ED converge (scale.make_matvec): view x as (Kp/128, 128)
    lane tiles, gather the whole 512-byte ROW holding each neighbour —
    the layout TPUs stream at HBM bandwidth — and recover the element
    with a fused one-hot lane select. ~20x on the same workload; the
    price is a (rows, P+1, 128) one-hot transient, so ``rows_per_chunk``
    must shrink accordingly (handled by the caller).
    """
    rank_fn, unrank_fn = make_sector_codec(n, k)
    dim = sector_dimension(n, k)
    B, G = rows_per_chunk, chunks_per_dispatch
    nl = 128

    @functools.partial(jax.jit, donate_argnums=(1,))
    def mv_span(x, y, start):
        if gather_mode == "row128":
            x2 = x.reshape(-1, nl)
            lane_iota = jax.lax.iota(jnp.int32, nl)

        def body(y, g):
            rows = start + g * B + jnp.arange(B, dtype=jnp.int32)
            valid = rows < dim
            states = unrank_fn(jnp.where(valid, rows, 0))
            nbrs, coeffs = operator.apply_padded(states)  # (B, P+1)
            r = jnp.clip(rank_fn(nbrs), 0, dim - 1)
            if gather_mode == "row128":
                tiles = x2[r >> 7]  # (B, P+1, 128) row gather
                sel = jnp.where(
                    (r & (nl - 1))[..., None] == lane_iota,
                    coeffs.astype(jnp.float32)[..., None],
                    0.0,
                )
                out = jnp.where(valid, jnp.sum(tiles * sel, axis=(1, 2)), 0.0)
            else:
                vals = coeffs.astype(jnp.float32) * x[r]
                out = jnp.where(valid, jnp.sum(vals, axis=1), 0.0)
            return jax.lax.dynamic_update_slice(y, out, (start + g * B,)), None

        y, _ = jax.lax.scan(body, y, jnp.arange(G, dtype=jnp.int32))
        return y

    return mv_span, dim


def ground_state_sector(
    operator: Operator,
    num_iter: int = 12,
    restarts: int = 40,
    tol: float = 1e-9,
    seed: int = 0,
    rows_per_chunk: Optional[int] = None,
    chunks_per_dispatch: int = 16,
    checkpoint_path: Optional[str] = None,
    dtype=jnp.float32,
    gather_mode: str = "auto",
) -> Tuple[float, np.ndarray]:
    """Restarted two-pass Lanczos ground state of a full (n, k) sector.

    Returns (energy, normalised ground-state vector on the host). The
    per-restart Ritz vector checkpoints to ``checkpoint_path`` so a
    relay stall / process death loses at most one restart.
    """
    basis = operator.basis
    n, k = basis.number_spins, basis.hamming_weight
    if gather_mode == "auto":
        # row128 pays a 128-lane select per non-zero: a loss for small
        # sectors that fit comfortably, the difference between 50 min
        # and ~2.5 min per matvec at sk_32 scale
        gather_mode = (
            "row128" if sector_dimension(n, k) >= (1 << 24) else "element"
        )
    if rows_per_chunk is None:
        # span = B*G rows per dispatch; keep padding waste small for tiny
        # sectors and dispatches bounded (~2M rows) for 601M-state ones
        dim_est = sector_dimension(n, k)
        rows_per_chunk = max(
            1024, 1 << (max(dim_est // chunks_per_dispatch, 1) - 1).bit_length()
        )
        # row128's (B, P+1, 128) one-hot transient must stay ~100 MB:
        # cap B at the largest power of two under the budget
        cap = 1 << 17
        if gather_mode == "row128":
            per_row = (operator.max_neighbours + 1) * 128 * 4
            cap = max(256, 1 << (max(int(100e6 // per_row), 1).bit_length() - 1))
        rows_per_chunk = min(rows_per_chunk, cap)
    mv_span, dim = _matvec_maker(
        operator, n, k, rows_per_chunk, chunks_per_dispatch,
        gather_mode=gather_mode,
    )
    span = rows_per_chunk * chunks_per_dispatch
    Kp = ((dim + span - 1) // span) * span
    m = num_iter
    logger.info(
        "sector ED: n={}, k={}, dim={} ({:.2f} GB per vector)",
        n, k, dim, Kp * 4 / 2**30,
    )

    def matvec(x):
        y = jnp.zeros(Kp, dtype=dtype)
        for s in range(0, Kp, span):
            y = mv_span(x, y, jnp.int32(s))
        return y

    rng = np.random.RandomState(seed)
    v0 = rng.standard_normal(dim)
    return two_pass_lanczos(
        matvec, dim, Kp, num_iter=num_iter, restarts=restarts, tol=tol,
        v0_host=v0, checkpoint_path=checkpoint_path, dtype=dtype,
        name="sector ED",
    )


def two_pass_lanczos(
    matvec,
    dim: int,
    Kp: int,
    num_iter: int,
    restarts: int,
    tol: float,
    v0_host: np.ndarray,
    checkpoint_path: Optional[str] = None,
    dtype=jnp.float32,
    name: str = "two-pass lanczos",
    theta0: float = np.inf,
) -> Tuple[float, np.ndarray]:
    """Memory-bound restarted Lanczos: NO stored Krylov basis.

    Pass 1 runs the 3-term recurrence collecting the tridiagonal; pass 2
    reruns it accumulating the lowest Ritz vector (Parlett ch.13). Peak
    device memory is four ``(Kp,)`` vectors — the driver of choice when a
    resident table (codebook kagome-36) or the sheer dimension (601M-state
    sk_32) leaves no room for an (m, Kp) basis. Per-restart checkpoints;
    sub-tolerance regressions reseed from the best Ritz vector and three
    in a row mean the working-precision floor (converged).
    """
    m = num_iter

    @jax.jit
    def dot64(a, b):
        return jax.lax.dot_general(
            a[None, :], b[:, None], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float64,
        )[0, 0]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def ortho_step(w, v, v_prev, alpha, beta_prev):
        w = w - alpha.astype(dtype) * v - beta_prev.astype(dtype) * v_prev
        nrm = jnp.sqrt(dot64(w, w))
        return w / nrm.astype(dtype), nrm

    @functools.partial(jax.jit, donate_argnums=(0,))
    def axpy(acc, c, v):
        return acc + c.astype(dtype) * v

    def lanczos_pass(v0, m, coeffs=None):
        """3-term recurrence; returns (alphas, betas) and, when ``coeffs``
        is given, the accumulated Ritz vector sum_j coeffs[j] v_j."""
        v_prev = jnp.zeros(Kp, dtype=dtype)
        v = v0
        acc = None
        if coeffs is not None:
            acc = jnp.zeros(Kp, dtype=dtype)
            acc = axpy(acc, jnp.float64(coeffs[0]), v)
        alphas, betas = [], []
        beta_prev = jnp.float64(0.0)
        for j in range(m):
            w = matvec(v)
            alpha = dot64(v, w)
            alphas.append(float(alpha))
            if j == m - 1:
                break
            w, beta = ortho_step(w, v, v_prev, alpha, beta_prev)
            betas.append(float(beta))
            v_prev, v = v, w
            beta_prev = beta
            if coeffs is not None:
                acc = axpy(acc, jnp.float64(coeffs[j + 1]), v)
            if float(beta) < 1e-8 * max(abs(a) for a in alphas):
                break
        return np.array(alphas), np.array(betas), acc

    def to_dev(x_host):
        return jnp.asarray(
            np.pad(x_host / np.linalg.norm(x_host), (0, Kp - dim)), dtype=dtype
        )

    best_theta, best_x = theta0, None
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        data = np.load(checkpoint_path)
        best_theta = float(data["theta"])
        best_x = data["x"].astype(np.float64)
        logger.info("{}: resuming from checkpoint (E = {:.12f})", name, best_theta)
        v = to_dev(best_x)
    else:
        v = to_dev(np.asarray(v0_host, dtype=np.float64))

    import scipy.linalg

    theta = np.inf
    stall = 0
    for r in range(restarts):
        t0 = time.time()
        alphas, betas, _ = lanczos_pass(v, m)
        mj = len(alphas)
        evals, evecs = scipy.linalg.eigh_tridiagonal(alphas, betas[: mj - 1])
        theta_new = float(evals[0])
        c = evecs[:, 0]
        regressed = theta_new > min(best_theta, theta) + max(
            10 * tol * max(1.0, abs(theta_new)), 1e-8
        )
        logger.info(
            "{} restart {}: E = {:.12f} ({:.0f}s){}",
            name, r, theta_new, time.time() - t0,
            "  ** regressed — reseeding" if regressed else "",
        )
        if regressed and best_x is not None:
            stall += 1
            if stall >= 3:
                # repeated sub-tolerance regressions: the Ritz value is
                # bouncing at the working-precision floor — converged
                logger.info("{}: converged at the working-precision floor", name)
                break
            v = to_dev(best_x)
            continue
        stall = 0

        # pass 2: rebuild the Krylov basis, accumulating the Ritz vector
        _, _, acc = lanczos_pass(v, mj, coeffs=c)
        nrm = float(np.sqrt(np.asarray(dot64(acc, acc))))
        v = (acc / nrm).astype(dtype)

        converged = abs(theta_new - theta) < tol * max(1.0, abs(theta_new))
        theta = theta_new
        if theta_new <= best_theta:
            best_theta = theta_new
            best_x = np.asarray(v[:dim], dtype=np.float64)
            if checkpoint_path is not None:
                tmp = checkpoint_path + ".wip.npz"
                np.savez(tmp, theta=theta_new, x=best_x)
                os.replace(tmp, checkpoint_path)
        if converged:
            break

    if best_x is None:
        # theta0 was already below every Ritz value seen (e.g. an f64
        # polish that cannot improve on its f32 seed): report the latest
        # Ritz vector
        best_x = np.asarray(v[:dim], dtype=np.float64)
        best_theta = theta
    x = best_x / np.linalg.norm(best_x)
    if x[np.argmax(np.abs(x))] < 0:
        x = -x
    return best_theta, x
