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
    if gather_mode == "row128" and (B * G) % nl != 0:
        # the row128 layout views x as (Kp/128, 128) lane tiles; the
        # padded length is rounded to span multiples, so a span that is
        # not a multiple of 128 would fail at trace time with an opaque
        # reshape error (the split driver validates the same invariant)
        raise ValueError(
            f"gather_mode='row128' needs rows_per_chunk*chunks_per_dispatch "
            f"divisible by 128, got {B}*{G}={B * G}"
        )

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


# ---------------------------------------------------------------------------
# Piece-split path: sectors whose vector exceeds the relay's per-program
# buffer wall. sk_32_1 (reference physical_systems/sk_32_1.yaml,
# Makefile:128-141) has 601,080,390 states = 2.4 GB per f32 vector; a
# monolithic matvec dispatch touches x AND y (~4.8 GB of buffer
# arguments), which the live relay rejects with RESOURCE_EXHAUSTED at
# ~3 GB regardless of free HBM. The split path stores every Lanczos
# vector as ``num_pieces`` lane-tile-aligned device pieces and bounds
# each program to ONE piece (+ a span-sized accumulator), at the price
# of re-scanning the neighbour gather once per input piece (masked
# one-hot select keeps it exact).

SECTOR_SPLIT_LIMIT = 600 << 20  # f32 vector bytes above which we split
# Re-scan cost scales with num_pieces, so pieces should be as large as the
# relay wall allows: ~1.25 GB piece + ~100 MB transients stays under the
# observed ~1.5 GB per-program ceiling → sk_32_1 (2.4 GB vector) runs as
# TWO pieces, paying a 2x (not 4x) neighbour re-scan.
SECTOR_PIECE_BYTES = 1280 << 20  # target bytes per device piece


def _no_duplicate_pairs(operator: Operator) -> bool:
    """True when every (i, j) term pair appears once with i != j — the
    precondition for the active-slot bound k*(n-k)+1 used to compact the
    padded neighbour axis (exchange terms only act on opposite-bit
    pairs, so a hamming-(n, k) state activates at most k*(n-k) of them)."""
    si = np.asarray(operator._site_i)
    sj = np.asarray(operator._site_j)
    pairs = set(zip(np.minimum(si, sj).tolist(), np.maximum(si, sj).tolist()))
    return len(pairs) == len(si) and bool(np.all(si != sj))


def make_sector_matvec_split(
    operator: Operator,
    num_pieces: int,
    rows_per_chunk: int = 512,
    chunks_per_dispatch: int = 512,
):
    """Piece-split row128 sector matvec.

    Returns ``(matvec, per, Kp)`` where ``matvec`` maps a list of
    ``num_pieces`` device pieces (each ``(per,)`` f32) to the same
    representation of H @ x. Every dispatch touches one input piece plus
    a ``(span,)`` accumulator, so program footprint stays at piece size
    (~SECTOR_PIECE_BYTES) no matter how large the sector is. Inactive
    padded-neighbour slots are compacted away (argsort on coeff == 0)
    when the operator's pair list permits the k*(n-k)+1 bound — for
    sk_32 this halves gather traffic (497 -> 257 slots).
    """
    basis = operator.basis
    n, k = basis.number_spins, basis.hamming_weight
    rank_fn, unrank_fn = make_sector_codec(n, k)
    dim = sector_dimension(n, k)
    B, G = rows_per_chunk, chunks_per_dispatch
    span = B * G
    nl = 128
    if span % nl != 0:
        raise ValueError("rows_per_chunk * chunks_per_dispatch must be a multiple of 128")
    per = -(-dim // (num_pieces * span)) * span
    Kp = per * num_pieces
    tiles_per_piece = per // nl
    P1 = operator.max_neighbours
    A = min(P1, k * (n - k) + 1) if _no_duplicate_pairs(operator) else P1
    lane_iota = jax.lax.iota(jnp.int32, nl)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def mv_partial(xp, acc, start, tile_off):
        """acc (span,) += rows [start, start+span) of H @ x restricted to
        the columns held by piece ``xp`` (first global tile ``tile_off``)."""
        x2 = xp.reshape(tiles_per_piece, nl)

        def body(acc, g):
            rows = start + g * B + jnp.arange(B, dtype=jnp.int32)
            valid = rows < dim
            states = unrank_fn(jnp.where(valid, rows, 0))
            nbrs, coeffs = operator.apply_padded(states)  # (B, P1)
            if A < P1:
                order = jnp.argsort((coeffs == 0.0).astype(jnp.int32), axis=1)[:, :A]
                nbrs = jnp.take_along_axis(nbrs, order, axis=1)
                coeffs = jnp.take_along_axis(coeffs, order, axis=1)
            r = jnp.clip(rank_fn(nbrs), 0, dim - 1)
            t = (r >> 7) - tile_off
            inside = (t >= 0) & (t < tiles_per_piece)
            tiles = x2[jnp.clip(t, 0, tiles_per_piece - 1)]  # (B, A, 128)
            sel = jnp.where(
                ((r & (nl - 1))[..., None] == lane_iota) & inside[..., None],
                coeffs.astype(jnp.float32)[..., None],
                0.0,
            )
            out = jnp.where(valid, jnp.sum(tiles * sel, axis=(1, 2)), 0.0)
            prev = jax.lax.dynamic_slice(acc, (g * B,), (B,))
            return jax.lax.dynamic_update_slice(acc, prev + out, (g * B,)), None

        acc, _ = jax.lax.scan(body, acc, jnp.arange(G, dtype=jnp.int32))
        return acc

    @functools.partial(jax.jit, donate_argnums=(0,))
    def write_span(yq, acc, local_start):
        return jax.lax.dynamic_update_slice(yq, acc, (local_start,))

    def matvec(x_pieces, spans_limit: Optional[int] = None):
        """H @ x over piece-split vectors. ``spans_limit`` bounds the
        number of output spans actually computed (probe/benchmark use:
        the result is then only valid on the covered prefix)."""
        y = []
        done = 0
        for q in range(num_pieces):
            yq = jnp.zeros(per, jnp.float32)
            for s in range(0, per, span):
                if spans_limit is not None and done >= spans_limit:
                    break
                acc = jnp.zeros(span, jnp.float32)
                gstart = jnp.int32(q * per + s)
                for p in range(num_pieces):
                    acc = mv_partial(
                        x_pieces[p], acc, gstart, jnp.int32(p * tiles_per_piece)
                    )
                yq = write_span(yq, acc, jnp.int32(s))
                done += 1
            y.append(yq)
        return y

    return matvec, per, Kp


def two_pass_lanczos_split(
    matvec,
    dim: int,
    per: int,
    num_pieces: int,
    num_iter: int,
    restarts: int,
    tol: float,
    v0_host: np.ndarray,
    checkpoint_path: Optional[str] = None,
    name: str = "sector ED (split)",
) -> Tuple[float, np.ndarray]:
    """Two-pass restarted Lanczos over piece-split f32 vectors.

    Same restart/regression/convergence logic as :func:`two_pass_lanczos`;
    every device program touches at most two pieces (one sub/axpy at a
    time), keeping the footprint under the relay wall. Checkpoints store
    the best Ritz vector as f32 (the working precision) to halve the
    host transfer per restart.
    """
    dtype = jnp.float32
    Kp = per * num_pieces

    @jax.jit
    def dot64_p(a, b):
        return jax.lax.dot_general(
            a[None, :], b[:, None], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float64,
        )[0, 0]

    def dot(a, b):
        return float(sum(np.asarray(dot64_p(a[p], b[p])) for p in range(num_pieces)))

    @functools.partial(jax.jit, donate_argnums=(0,))
    def sub_p(w, c, v):
        return w - jnp.asarray(c, dtype) * v

    @functools.partial(jax.jit, donate_argnums=(0,))
    def scale_p(w, c):
        return w * jnp.asarray(c, dtype)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def axpy_p(acc, c, v):
        return acc + jnp.asarray(c, dtype) * v

    def lanczos_pass(v0, m, coeffs=None):
        v_prev = [jnp.zeros(per, dtype) for _ in range(num_pieces)]
        v = v0
        acc = None
        if coeffs is not None:
            acc = [jnp.zeros(per, dtype) for _ in range(num_pieces)]
            acc = [axpy_p(acc[p], coeffs[0], v[p]) for p in range(num_pieces)]
        alphas, betas = [], []
        beta_prev = 0.0
        for j in range(m):
            w = matvec(v)
            alpha = dot(v, w)
            alphas.append(alpha)
            if j == m - 1:
                break
            w = [sub_p(w[p], alpha, v[p]) for p in range(num_pieces)]
            w = [sub_p(w[p], beta_prev, v_prev[p]) for p in range(num_pieces)]
            beta = float(np.sqrt(dot(w, w)))
            betas.append(beta)
            w = [scale_p(w[p], 1.0 / beta) for p in range(num_pieces)]
            v_prev, v = v, w
            beta_prev = beta
            if coeffs is not None:
                v = list(v)
                acc = [axpy_p(acc[p], coeffs[j + 1], v[p]) for p in range(num_pieces)]
            if beta < 1e-8 * max(abs(a) for a in alphas):
                break
        return np.array(alphas), np.array(betas), acc

    def to_dev(x_host):
        x = np.pad(
            np.asarray(x_host, dtype=np.float64) / np.linalg.norm(x_host),
            (0, Kp - dim),
        ).astype(np.float32)
        return [jnp.asarray(x[p * per : (p + 1) * per]) for p in range(num_pieces)]

    def to_host(v):
        return np.concatenate([np.asarray(p) for p in v])[:dim]

    best_theta, best_x = np.inf, None
    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        data = np.load(checkpoint_path)
        best_theta = float(data["theta"])
        best_x = np.asarray(data["x"], dtype=np.float32)
        logger.info("{}: resuming from checkpoint (E = {:.12f})", name, best_theta)
        v = to_dev(best_x)
    else:
        v = to_dev(v0_host)

    import scipy.linalg

    theta = np.inf
    stall = 0
    for r in range(restarts):
        t0 = time.time()
        alphas, betas, _ = lanczos_pass(v, num_iter)
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
                logger.info("{}: converged at the working-precision floor", name)
                break
            v = to_dev(best_x)
            continue
        stall = 0

        _, _, acc = lanczos_pass(v, mj, coeffs=c)
        nrm = np.sqrt(dot(acc, acc))
        v = [scale_p(acc[p], 1.0 / nrm) for p in range(len(acc))]

        converged = abs(theta_new - theta) < tol * max(1.0, abs(theta_new))
        theta = theta_new
        if theta_new <= best_theta:
            best_theta = theta_new
            best_x = to_host(v).astype(np.float32)
            if checkpoint_path is not None:
                tmp = checkpoint_path + ".wip.npz"
                np.savez(tmp, theta=theta_new, x=best_x)
                os.replace(tmp, checkpoint_path)
        if converged:
            break

    if best_x is None:
        best_x = to_host(v)
        best_theta = theta
    x = np.asarray(best_x, dtype=np.float64)
    x /= np.linalg.norm(x)
    if x[np.argmax(np.abs(x))] < 0:
        x = -x
    return best_theta, x


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
    dim_est = sector_dimension(n, k)
    if gather_mode == "auto" and dim_est * 4 > SECTOR_SPLIT_LIMIT:
        # monolithic dispatches would present x AND y (2 * vector bytes)
        # to one program — over the relay's per-program buffer wall for
        # sk_32-class sectors. Route to the piece-split driver.
        num_pieces = -(-dim_est * 4 // SECTOR_PIECE_BYTES)
        mv, per, Kp = make_sector_matvec_split(
            operator, num_pieces,
            rows_per_chunk=rows_per_chunk or 512,
            chunks_per_dispatch=max(chunks_per_dispatch, 512),
        )
        logger.info(
            "sector ED (split): n={}, k={}, dim={} as {} pieces of {:.2f} GB",
            n, k, dim_est, num_pieces, per * 4 / 2**30,
        )
        if dtype != jnp.float32:
            logger.warning(
                "ground_state_sector: the piece-split route is f32-only; "
                "ignoring requested dtype={} (certify the result with a "
                "streaming f64 residual pass instead)", dtype,
            )
        rng = np.random.RandomState(seed)
        return two_pass_lanczos_split(
            mv, dim_est, per, num_pieces, num_iter=num_iter,
            restarts=restarts, tol=tol, v0_host=rng.standard_normal(dim_est),
            checkpoint_path=checkpoint_path,
        )
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
