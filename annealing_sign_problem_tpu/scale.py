"""Large-scale symmetry-adapted bases and exact diagonalisation on TPU.

The reference relies on an external Haskell ED binary (SpinED) plus the
lattice_symmetries C++ library to build symmetry-adapted bases of up to
31.5 million representatives (kagome-36; heisenberg_kagome_36.yaml:4) —
about two hours on a 32-core node. Here both steps are TPU-first:

- **Representative enumeration**: the hamming sector is enumerated as a
  (high-half x low-half) product of precomputed fixed-weight half-words,
  so batches materialise *on device* from tiny uploads. Group images are
  computed with exact f32 bit-permutation matmuls on the MXU
  (basis._perm_images_device); a state survives iff it is its orbit's
  minimum and its stabiliser character sum is nonzero. Downloads are a
  bit-packed survivor mask per batch.
- **Ground state**: restarted Lanczos whose matvec applies the operator
  on the fly (no materialised matrix): padded term application -> orbit
  mapping (MXU) -> sorted-representative lookup -> sqrt-norm-corrected
  coefficients, streamed over the basis in chunks.

Everything is shape-bucketed and jitted once per system.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .basis import SpinBasis, enumerate_fixed_hamming
from .lanczos import LanczosCallbacks, thick_restart_lanczos
from .operator import Operator
from .utils.log import logger

__all__ = [
    "enumerate_representatives",
    "build_basis_at_scale",
    "ground_state_large",
    "ground_state_sharded",
]


def _survivor_kernel(basis: SpinBasis):
    """Jitted batch kernel: states -> (packed survivor bits, stab sums)."""

    @jax.jit
    def kernel(his: jax.Array, los: jax.Array):
        # states = outer product of high and low half-words
        states = (his[:, None] | los[None, :]).reshape(-1)
        _, is_rep, stab = basis.orbit_info_device(states)
        keep = is_rep & (jnp.abs(stab) > 1e-9)
        # pack survivors bitwise (little-endian within bytes, matching the
        # host-side unpack) to shrink the download 8x
        pad = (-keep.shape[0]) % 8
        bits = jnp.concatenate([keep, jnp.zeros(pad, dtype=bool)])
        w = bits.reshape(-1, 8).astype(jnp.uint8)
        packed = jnp.sum(w << jnp.arange(8, dtype=jnp.uint8), axis=1, dtype=jnp.uint8)
        return packed, stab.astype(jnp.float32)

    return kernel


def enumerate_representatives(
    basis: SpinBasis,
    hi_batch: int = 128,
    progress_every: int = 50,
) -> Tuple[np.ndarray, np.ndarray]:
    """All representatives (sorted) + stabiliser sums of a symmetric
    hamming sector, computed on device."""
    n = basis.number_spins
    k = basis.hamming_weight
    if k is None:
        raise ValueError("large-scale enumeration requires a hamming sector")
    n_lo = n // 2
    n_hi = n - n_lo

    lo_lists = {
        kl: enumerate_fixed_hamming(n_lo, kl) for kl in range(min(k, n_lo) + 1)
    }
    hi_lists = {
        kh: (enumerate_fixed_hamming(n_hi, kh) << np.uint64(n_lo))
        for kh in range(min(k, n_hi) + 1)
    }

    kernel = _survivor_kernel(basis)
    reps_out, stabs_out = [], []
    t0 = time.time()
    total = 0
    batches = 0
    grand_total = float(
        sum(
            len(hi_lists[kh]) * len(lo_lists[k - kh])
            for kh in range(max(0, k - n_lo), min(k, n_hi) + 1)
        )
    )
    for kh in range(max(0, k - n_lo), min(k, n_hi) + 1):
        kl = k - kh
        his_all = hi_lists[kh]
        los = jnp.asarray(lo_lists[kl])
        for s in range(0, len(his_all), hi_batch):
            his = his_all[s : s + hi_batch]
            packed, stab = kernel(jnp.asarray(his), los)
            packed = np.asarray(packed)
            B = len(his) * len(los)
            # device packing is little-endian within each byte
            bits = (packed[:, None] >> np.arange(8, dtype=np.uint8)) & 1
            keep = bits.reshape(-1)[:B].astype(bool)
            if keep.any():
                states = (his[:, None] | np.asarray(los)[None, :]).reshape(-1)
                reps_out.append(states[keep])
                stabs_out.append(np.asarray(stab)[keep])
            total += B
            batches += 1
            if batches % progress_every == 0:
                logger.info(
                    "enumeration: {:.2e}/{:.2e} states scanned ({:.0f}s)",
                    total, grand_total, time.time() - t0,
                )
    reps = np.concatenate(reps_out) if reps_out else np.zeros(0, np.uint64)
    stabs = np.concatenate(stabs_out) if stabs_out else np.zeros(0)
    order = np.argsort(reps)
    logger.info(
        "enumeration done: {} representatives out of {:.3e} states in {:.0f}s",
        len(reps), total, time.time() - t0,
    )
    return reps[order], stabs[order].astype(np.float64)


def build_basis_at_scale(
    basis: SpinBasis, cache_path: Optional[str] = None, **kwargs
) -> SpinBasis:
    """Build a symmetric basis by device enumeration (norms included).

    ``cache_path`` (an .npz file) persists the representative list — it is
    the expensive artifact of the whole pipeline, like the reference's
    downloaded basis files (README.md:62-90)."""
    import os

    if cache_path is not None and os.path.exists(cache_path):
        data = np.load(cache_path)
        logger.info("loaded {} representatives from {}", len(data["reps"]), cache_path)
        basis.build(representatives=data["reps"])
        basis._norms = data["norms"]
        return basis
    reps, stabs = enumerate_representatives(basis, **kwargs)
    basis.build(representatives=reps)
    basis._norms = stabs
    if cache_path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(cache_path)), exist_ok=True)
        np.savez_compressed(cache_path, reps=reps, norms=stabs)
    return basis


# ---------------------------------------------------------------------------
# Matrix-free large-scale ED
# ---------------------------------------------------------------------------


def ground_state_large(
    operator: Operator,
    num_iter: int = 48,
    restarts: int = 8,
    tol: float = 1e-9,
    chunk_size: Optional[int] = None,
    dtype=jnp.float32,
    seed: int = 0,
    image_buffer_bytes: int = 1 << 30,
    ell_budget_bytes: int = 6 << 30,
    polish_restarts: int = 2,
    polish_dtype=jnp.float64,
    thick: int = 6,
    checkpoint_path: Optional[str] = None,
) -> Tuple[float, np.ndarray]:
    """Restarted Lanczos with an on-the-fly symmetrised matvec.

    Handles bases far beyond what a materialised matrix allows (the
    kagome-36 sector is 31.5M representatives; an ELL cache would need
    ~18 GB). Runs the bulk of the iteration in ``dtype`` (f32 — fast on
    device) and polishes with ``polish_restarts`` float64 restarts so the
    sign/amplitude oracle reaches reference (f64) quality. Returns
    (energy, float64-normalised eigenvector on host).
    """
    basis = operator.basis
    K = basis.number_states
    W = operator.max_neighbours
    # when the resolved neighbour table fits in HBM, build it once and make
    # every matvec a pure gather (the orbit reduction costs ~1000x more
    # than a gather and is iteration-independent)
    ell_bytes = K * W * 8
    use_cached_ell = ell_bytes <= ell_budget_bytes
    if chunk_size is None:
        # bound the per-chunk orbit-image working set: each state expands
        # to (P+1) neighbours x 2G images (uint64) plus f32 matmul parts
        G2 = 2 * basis._perms.shape[0] * (2 if basis.spin_inversion else 1)
        per_state = max((operator.max_neighbours) * G2 * 12, 1)
        chunk_size = 1 << max(10, int(np.log2(max(image_buffer_bytes // per_state, 1))))
        chunk_size = min(chunk_size, 1 << 17)
        logger.debug("ground_state_large: chunk_size = {}", chunk_size)
    pad = (-K) % chunk_size
    states_p = np.concatenate([basis.states, np.zeros(pad, dtype=np.uint64)])
    norms_p = np.concatenate([np.sqrt(basis.norms), np.ones(pad)])
    n_chunks = len(states_p) // chunk_size
    d_chunks = jnp.asarray(states_p.reshape(n_chunks, chunk_size))
    d_norms = jnp.asarray(norms_p.reshape(n_chunks, chunk_size), dtype=jnp.float32)
    states_dev = basis.states_device
    norms_dev = jnp.asarray(np.sqrt(basis.norms), dtype=jnp.float32)
    m = min(num_iter, K)

    def resolve_chunk(chunk_states, chunk_norm, states_s, norms_s, dt, x=None):
        nbrs, coeffs = operator.apply_padded(chunk_states)
        idx = jnp.clip(jnp.searchsorted(states_s, nbrs), 0, K - 1)
        member = states_s[idx] == nbrs
        factor = jnp.where(member, norms_s[idx], 0.0) / chunk_norm[:, None]
        vals = coeffs.astype(dt) * factor.astype(dt)
        if x is None:
            return idx.astype(jnp.int32), vals
        return jnp.sum(vals * x[idx], axis=1)

    ell_idx = ell_val = None
    if use_cached_ell:
        logger.info(
            "building resolved neighbour table ({:.2f} GB on device)",
            ell_bytes / 2**30,
        )

        @jax.jit
        def build_all(chunks, cnorms, states_s, norms_s):
            # one dispatch: each host->device round trip costs ~100ms over
            # the link, so the whole table builds in a device-side scan
            def body(_, c):
                return None, resolve_chunk(
                    chunks[c], cnorms[c], states_s, norms_s, jnp.float32
                )

            _, (I, V) = jax.lax.scan(body, None, jnp.arange(n_chunks))
            W_slots = I.shape[-1]
            return I.reshape(-1, W_slots)[:K], V.reshape(-1, W_slots)[:K]

        ell_idx, ell_val = build_all(d_chunks, d_norms, states_dev, norms_dev)
        ell_idx.block_until_ready()
        logger.info("neighbour table ready")

    def make_callbacks(dt):
        """jitted Lanczos step + restart transform for one working dtype.

        Large tables are passed as jit *arguments* — closing over them
        would embed 100s of MB of constants in the HLO and overflow the
        compile path."""
        if use_cached_ell:
            big = (ell_idx, ell_val.astype(dt))

            def matvec(x, big):
                I, V = big
                return jnp.sum(V * x[I], axis=1)

        else:
            big = (d_chunks, d_norms, states_dev, norms_dev)

            def matvec(x, big):
                chunks, cnorms, states_s, norms_s = big

                def chunk_body(_, c):
                    return None, resolve_chunk(
                        chunks[c], cnorms[c], states_s, norms_s, dt, x
                    )

                _, parts = jax.lax.scan(chunk_body, None, jnp.arange(n_chunks))
                return parts.reshape(-1)[:K]

        # one dispatch per Lanczos iteration: the device holds V; the host
        # only sees (alpha, beta) scalars — and dispatches stay at seconds
        # granularity, clear of runtime watchdogs on long executions.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def lanczos_step(V, v, j, big):
            w = matvec(v, big)
            alpha = jnp.vdot(v, w)
            w = w - alpha * v
            for _ in range(2):
                w = w - V.T @ (V @ w)
            beta = jnp.linalg.norm(w)
            v_next = w / jnp.where(beta > 0, beta, 1.0)
            V = V.at[j].set(v)
            return V, v_next, alpha, beta

        @functools.partial(jax.jit, donate_argnums=(0,))
        def restart(V, S):
            Y = jnp.einsum("mi,mk->ik", jnp.asarray(S, dtype=V.dtype), V)
            Y = Y / jnp.linalg.norm(Y, axis=1, keepdims=True)
            return jnp.zeros_like(V).at[: Y.shape[0]].set(Y)

        return LanczosCallbacks(
            step=lambda V, v, j: lanczos_step(V, v, jnp.uint32(j), big),
            restart=restart,
            row0_host=lambda V: np.asarray(V[0], dtype=np.float64),
            new_basis=lambda: jnp.zeros((m, K), dtype=dt),
            to_device=lambda x: jnp.asarray(x / np.linalg.norm(x), dtype=dt),
        )

    rng = np.random.RandomState(seed)
    v = rng.standard_normal(K)
    v /= np.linalg.norm(v)

    cb = make_callbacks(dtype)
    theta, x = thick_restart_lanczos(
        cb, cb.to_device(v), m, restarts, tol=tol, thick=thick,
        checkpoint_path=checkpoint_path, name="large f32",
    )
    if polish_restarts > 0 and np.dtype(polish_dtype) != np.dtype(dtype):
        cb64 = make_callbacks(polish_dtype)
        ckpt64 = None if checkpoint_path is None else checkpoint_path + ".f64.npz"
        theta, x = thick_restart_lanczos(
            cb64, cb64.to_device(x), m, polish_restarts, tol=tol, thick=thick,
            checkpoint_path=ckpt64, name="large f64", theta0=theta,
        )
    return theta, x


# ---------------------------------------------------------------------------
# Mesh-sharded large-scale ED (basis dimension over chips)
# ---------------------------------------------------------------------------


def ground_state_sharded(
    operator: Operator,
    mesh,
    num_iter: int = 48,
    restarts: int = 8,
    tol: float = 1e-9,
    chunk_size: int = 4096,
    dtype=jnp.float32,
    seed: int = 0,
) -> Tuple[float, np.ndarray]:
    """Lanczos with the resolved neighbour table row-sharded over a mesh.

    The kagome-36 table is ~18 GB — beyond one chip's HBM but 2.3 GB/chip
    on an 8-chip slice. Each device resolves and stores its own row range
    (no host round trip); the Lanczos vectors are row-sharded alongside,
    and GSPMD inserts the all-gather of x for the neighbour gather plus
    psums for the inner products.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    basis = operator.basis
    K = basis.number_states
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P(axis))
    rows2d = NamedSharding(mesh, P(axis, None))
    cols2d = NamedSharding(mesh, P(None, axis))

    pad = (-K) % (chunk_size * n_dev)
    states_p = np.concatenate([basis.states, np.zeros(pad, dtype=np.uint64)])
    norms_p = np.concatenate([np.sqrt(basis.norms), np.ones(pad)])
    Kp = len(states_p)
    n_chunks = Kp // chunk_size

    d_chunks = jax.device_put(jnp.asarray(states_p.reshape(n_chunks, chunk_size)), rows2d)
    d_norms = jax.device_put(
        jnp.asarray(norms_p.reshape(n_chunks, chunk_size), dtype=jnp.float32), rows2d
    )
    states_dev = jax.device_put(basis.states_device, repl)
    norms_dev = jax.device_put(jnp.asarray(np.sqrt(basis.norms), dtype=jnp.float32), repl)

    @functools.partial(jax.jit, out_shardings=(rows2d, rows2d))
    def build_all(chunks, cnorms, states_s, norms_s):
        def resolve(chunk_states, chunk_norm):
            nbrs, coeffs = operator.apply_padded(chunk_states)
            idx = jnp.clip(jnp.searchsorted(states_s, nbrs), 0, K - 1)
            member = states_s[idx] == nbrs
            factor = jnp.where(member, norms_s[idx], 0.0) / chunk_norm[:, None]
            return idx.astype(jnp.int32), coeffs.astype(dtype) * factor.astype(dtype)

        I, V = jax.vmap(resolve)(chunks, cnorms)
        W_slots = I.shape[-1]
        return I.reshape(Kp, W_slots), V.reshape(Kp, W_slots)

    ell_idx, ell_val = build_all(d_chunks, d_norms, states_dev, norms_dev)
    logger.info(
        "sharded neighbour table: {:.2f} GB over {} devices",
        ell_idx.size * 4 * 2 / 2**30, n_dev,
    )

    m = min(num_iter, K)

    @functools.partial(jax.jit, donate_argnums=(0,), out_shardings=(cols2d, rows, None, None))
    def lanczos_step(V, v, j, I, Vals):
        xg = v  # GSPMD all-gathers v for the row gather below
        w = jnp.sum(Vals * xg[I], axis=1)[:K]
        w = jnp.concatenate([w, jnp.zeros(pad, dtype=w.dtype)])
        alpha = jnp.vdot(v[:K], w[:K])
        w = w - alpha * v
        for _ in range(2):
            w = w - V.T @ (V @ w)
        beta = jnp.linalg.norm(w)
        v_next = w / jnp.where(beta > 0, beta, 1.0)
        V = V.at[j].set(v)
        return V, v_next, alpha, beta

    @functools.partial(jax.jit, donate_argnums=(0,), out_shardings=cols2d)
    def restart_transform(V, S):
        Y = jnp.einsum("mi,mk->ik", jnp.asarray(S, dtype=V.dtype), V)
        Y = Y / jnp.linalg.norm(Y, axis=1, keepdims=True)
        return jnp.zeros_like(V).at[: Y.shape[0]].set(Y)

    def to_device(x_host):
        xp = np.zeros(Kp)
        xp[:K] = x_host[:K] / np.linalg.norm(x_host[:K])
        return jax.device_put(jnp.asarray(xp, dtype=dtype), rows)

    cb = LanczosCallbacks(
        step=lambda V, v, j: lanczos_step(V, v, jnp.uint32(j), ell_idx, ell_val),
        restart=restart_transform,
        row0_host=lambda V: np.asarray(V[0][:K], dtype=np.float64),
        new_basis=lambda: jax.device_put(jnp.zeros((m, Kp), dtype=dtype), cols2d),
        to_device=to_device,
    )

    rng = np.random.RandomState(seed)
    v0 = np.zeros(Kp)
    v0[:K] = rng.standard_normal(K)
    return thick_restart_lanczos(
        cb, to_device(v0), m, restarts, tol=tol, thick=6, name="sharded",
    )


# ---------------------------------------------------------------------------
# Single-chip kagome-36-class ED: packed index+code neighbour table
# ---------------------------------------------------------------------------


def ground_state_codebook(
    operator: Operator,
    num_iter: int = 24,
    restarts: int = 8,
    tol: float = 1e-9,
    chunk_size: int = 2048,
    super_chunks: int = 24,
    seed: int = 0,
    polish_restarts: int = 1,
    polish_iter: int = 12,
    block_cache_dir: Optional[str] = None,
    thick: int = 6,
    checkpoint_path: Optional[str] = None,
    low_memory: bool = True,
    gather_mode: str = "row128",
    polish_gather_mode: str = "element",
) -> Tuple[float, np.ndarray]:
    """Ground state of a basis whose f32 neighbour table exceeds HBM.

    The f32 phase uses the fast ``row128`` matvec; the f64 polish
    defaults to the ``element`` decode — its per-slice transients are
    tiny, and the doubled vector footprint already crowds the relay's
    per-program wall (row128 f64 drew RESOURCE_EXHAUSTED even with
    ~700 MB table buffers).

    Observation: the symmetrised off-diagonal matrix elements take very few
    distinct values — (off-diagonal term entries) x (+-1 characters) x
    sqrt(stabiliser ratios) — 63 for kagome-36. So each (neighbour index,
    coefficient) pair packs into ONE int32: 25 bits of index + 7 bits of
    codebook id. The kagome-36 table shrinks from 18 GB to 9.1 GB and fits
    a single chip; the diagonal is stored densely (one entry per row).
    """
    basis = operator.basis
    K = basis.number_states
    W = operator.max_neighbours
    if K >= (1 << 25):
        raise ValueError("packed index field is 25 bits (basis too large)")

    # ---- the codebook: every possible off-diagonal value -------------------
    offs = np.unique(operator._offdiag_table)
    offs = offs[offs != 0.0]
    u = np.unique(basis.norms)
    ratios = np.unique(np.sqrt(np.outer(u, 1.0 / u)).reshape(-1))
    values = np.unique(
        np.concatenate([np.outer(offs, ratios).reshape(-1),
                        -np.outer(offs, ratios).reshape(-1), [0.0]])
    ).astype(np.float32)
    if len(values) > 127:
        raise ValueError(f"codebook too large ({len(values)} > 127)")
    codebook = jnp.asarray(values)
    logger.info("codebook: {} distinct off-diagonal values", len(values))

    # pad so rows split evenly into chunks AND into the matvec row slices
    # (the decode temp of one slice must stay small — an unsliced decode
    # materialises a second table-sized buffer and OOMs)
    row_slices = 32
    pad = (-K) % (chunk_size * row_slices)
    Kp = K + pad
    states_p = np.concatenate([basis.states, np.zeros(pad, dtype=np.uint64)])
    norms_p = np.concatenate([np.sqrt(basis.norms), np.ones(pad)])
    n_chunks = Kp // chunk_size
    d_chunks = jnp.asarray(states_p.reshape(n_chunks, chunk_size))
    d_norms = jnp.asarray(norms_p.reshape(n_chunks, chunk_size), dtype=jnp.float32)
    states_dev = basis.states_device
    norms_dev = jnp.asarray(np.sqrt(basis.norms), dtype=jnp.float32)

    # ---- build the packed table as independent row blocks ------------------
    # NEVER one monolithic (Kp, W-1) buffer: a scan carry (or concatenate)
    # would transiently double 9 GB and take down the chip. Each dispatch
    # returns its own block; the block list IS the table.
    @jax.jit
    def build_super(chunks_slice, cnorms_slice, states_s, norms_s, cb):
        def body(_, i):
            nbrs, coeffs = operator.apply_padded(chunks_slice[i])
            idx = jnp.clip(jnp.searchsorted(states_s, nbrs), 0, K - 1)
            member = states_s[idx] == nbrs
            factor = jnp.where(member, norms_s[idx], 0.0) / cnorms_slice[i][:, None]
            vals = coeffs.astype(jnp.float32) * factor
            # encode off-diagonal slots: nearest codebook entry
            off_vals = vals[:, 1:]
            pos = jnp.clip(jnp.searchsorted(cb, off_vals), 1, cb.shape[0] - 1)
            left, right = cb[pos - 1], cb[pos]
            code = jnp.where(off_vals - left < right - off_vals, pos - 1, pos)
            word = idx[:, 1:].astype(jnp.uint32) | (code.astype(jnp.uint32) << 25)
            err = jnp.max(jnp.abs(jnp.where(
                code == pos - 1, off_vals - left, off_vals - right)))
            return None, (word, vals[:, 0], err)

        _, (words, diags, errs) = jax.lax.scan(
            body, None, jnp.arange(chunks_slice.shape[0])
        )
        return (
            words.reshape(-1, words.shape[-1]),
            diags.reshape(-1),
            jnp.max(errs),
        )

    blocks = []
    t0 = time.time()
    # dispatches much beyond ~60 chunks (~10s) have crashed the TPU worker
    # in this environment; keep them short — the per-dispatch RTT is small
    per = int(np.clip(n_chunks // super_chunks, 1, 64))
    max_err = 0.0
    if block_cache_dir is not None:
        os.makedirs(block_cache_dir, exist_ok=True)
    for bi, s in enumerate(range(0, n_chunks, per)):
        e = min(s + per, n_chunks)
        cache_file = (
            None if block_cache_dir is None
            else f"{block_cache_dir}/block_{bi:05d}.npz"
        )
        expected_rows = (e - s) * chunk_size
        if cache_file is not None and os.path.exists(cache_file):
            data = np.load(cache_file)
            words = data["words"]
            diags = data["diags"]
            err = 0.0
            if words.shape[0] != expected_rows:  # stale cache (padding changed)
                words = None
        else:
            words = None
        if words is None:
            words, diags, err = build_super(
                d_chunks[s:e], d_norms[s:e], states_dev, norms_dev, codebook
            )
            # blocks live on the HOST until final placement: keeping both
            # the block list and the assembled buffer on device would need
            # 2x the table memory
            words, diags = np.asarray(words), np.asarray(diags)
            err = float(err)
            if cache_file is not None:
                np.savez(cache_file, words=words, diags=diags)
        blocks.append((words, diags))
        max_err = max(max_err, err)
        logger.info(
            "packed table: {}/{} chunks ({:.0f}s), encode err {:.2e}",
            e, n_chunks, time.time() - t0, max_err,
        )
    if max_err > 1e-5:
        raise RuntimeError(f"codebook encoding error too large: {max_err}")

    # assemble the table into ONE device buffer, streamed block by block:
    # - hundreds of per-call block arguments cost ~50s of per-dispatch
    #   overhead through the relay, so the Lanczos step must take one buffer
    # - a single 9 GB host->device transfer crashes the relay, so stream
    # - device-side concatenation would transiently double the 9 GB, so
    #   update a preallocated buffer in place (donated)
    logger.info("assembling packed table on device ...")

    # layout: a few (w_span, Kp) buffers —
    # - rows on the (8-aligned) sublane axis, basis on lanes: the row-major
    #   (Kp, 72) layout pads 72 -> 128 lanes physically (+78% of 9 GB)
    # - each buffer stays under 2^31 elements (XLA's single-buffer index
    #   arithmetic limit; the compiler subprocess crashes beyond it)
    # each buffer must stay under 2^31 elements AND its per-dispatch program
    # footprint (buffer + vectors) under ~1.5 GB — larger per-program
    # buffers draw RESOURCE_EXHAUSTED from the relay even when total HBM
    # has room (probed: 3 GB buffers fail, 1.4 GB buffers run). ~800 MB
    # buffers leave room for the f64 polish's two 253 MB vectors in the
    # same program (1.26 GB buffers + f64 vectors OOMed it)
    max_elems = min((1 << 31) - (1 << 24), (3 << 29) // 8)
    rows_per_split = max(int(max_elems // Kp), 1)
    split_starts = list(range(0, W - 1, rows_per_split))
    split_spans = [min(rows_per_split, W - 1 - s) for s in split_starts]

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def place_block(big_ws, big_d, part_w, part_d, off):
        part_t = part_w.T
        new_ws = tuple(
            jax.lax.dynamic_update_slice(
                bw, jax.lax.dynamic_slice_in_dim(part_t, s, span, axis=0),
                (jnp.int32(0), off),
            )
            for bw, s, span in zip(big_ws, split_starts, split_spans)
        )
        return new_ws, jax.lax.dynamic_update_slice(big_d, part_d, (off,))

    packed_words = tuple(
        jnp.zeros((span, Kp), dtype=jnp.uint32) for span in split_spans
    )
    packed_diag = jnp.zeros((Kp,), dtype=jnp.float32)
    off = 0
    for wd, dg in blocks:
        packed_words, packed_diag = place_block(
            packed_words, packed_diag, wd, dg, jnp.int32(off)
        )
        off += wd.shape[0]
    del blocks
    packed_words[0].block_until_ready()
    # release the build-phase device buffers (~750 MB: chunked states,
    # norms, and the cached sorted-state table) — with the 8.5 GB table
    # plus the Lanczos basis resident, every buffer counts
    del d_chunks, d_norms, states_dev, norms_dev
    basis._states_device = None
    logger.info(
        "packed table resident on device ({:.2f} GB in {} buffers)",
        sum(p.size for p in packed_words) * 4 / 2**30, len(packed_words),
    )
    try:
        stats = jax.local_devices()[0].memory_stats()
        logger.info(
            "device memory: {:.2f}/{:.2f} GB in use",
            stats.get("bytes_in_use", 0) / 2**30,
            stats.get("bytes_limit", 0) / 2**30,
        )
    except Exception:  # the relay backend may not expose stats
        pass

    m = min(num_iter, K)

    def make_matvec(dt, gather_mode: str = "row128"):
        """Table matvec for the two-pass (no stored V) driver.

        ``gather_mode="element"`` is the round-2 design: one random
        1-element gather per table entry — latency-bound at ~50M
        gathers/s on the relay-attached v5e (a 2.2e9-entry kagome-36
        matvec costs ~50-70 s). ``"row128"`` restructures every lookup
        as a 512-byte aligned ROW gather from v viewed as (Kp/128, 128)
        — each fetch moves a full lane tile, the layout TPUs stream at
        HBM bandwidth — and recovers the exact element with a fused
        one-hot lane select; the 7-bit codebook id decodes through a
        one-hot compare-select too (an element gather from even a
        128-entry table would reintroduce the latency wall).
        """
        nl = 128  # lane-tile width of the row-gather view
        if gather_mode == "row128" and Kp % nl != 0:
            gather_mode = "element"  # tiny test bases only
        # transient per scan slice: several (span, rows, 128)-shaped
        # intermediates (gathered tiles, one-hot selects). The per-program
        # footprint must stay under the relay's ~2 GB wall NEXT TO the
        # 1.26 GB table buffer and two resident vectors, so f64 slices
        # 4x finer than f32 (observed: 2048 slices OOM the f64 pass)
        if gather_mode == "row128":
            slices = 8192 if dt == jnp.float64 else 2048
            while Kp % slices:
                slices //= 2
        else:
            slices = row_slices
        rows = Kp // slices

        @functools.partial(jax.jit, donate_argnums=(0,))
        def tp_pass(acc, wbuf, v, cb):
            cbt = cb.astype(dt)
            span = wbuf.shape[0]
            w3 = wbuf.reshape(span, slices, rows)
            if gather_mode == "row128":
                v2 = v.reshape(Kp // nl, nl)
                lane_iota = jax.lax.iota(jnp.int32, nl)
                code_iota = jax.lax.iota(jnp.int32, cb.shape[0])

                def mv_slice(_, si):
                    wd = w3[:, si]  # (span, rows)
                    idx = (wd & jnp.uint32((1 << 25) - 1)).astype(jnp.int32)
                    code = (wd >> 25).astype(jnp.int32)
                    tiles = v2[idx >> 7]  # (span, rows, 128) row gather
                    cval = jnp.sum(
                        jnp.where(code[..., None] == code_iota, cbt, 0), axis=-1
                    )
                    sel = jnp.where(
                        (idx & (nl - 1))[..., None] == lane_iota,
                        cval[..., None],
                        jnp.zeros((), dt),
                    )
                    return None, jnp.sum(tiles * sel, axis=(0, 2))
            else:

                def mv_slice(_, si):
                    wd = w3[:, si]
                    idx = (wd & jnp.uint32((1 << 25) - 1)).astype(jnp.int32)
                    code = (wd >> 25).astype(jnp.int32)
                    return None, jnp.sum(cbt[code] * v[idx], axis=0)

            _, p = jax.lax.scan(mv_slice, None, jnp.arange(slices))
            return acc + p.reshape(-1)

        @jax.jit
        def tp_start(diags, v):
            return diags.astype(dt) * v

        def matvec(v):
            w = tp_start(packed_diag, v)
            for wbuf in packed_words:
                w = tp_pass(w, wbuf, v, codebook)
            return w

        return matvec

    def make_callbacks(dt, m_phase):
        rows = Kp // row_slices

        # one program per table buffer: the remote compiler falls over when
        # a single program's argument footprint approaches HBM size, so the
        # matvec is split into one dispatch per sub-2^31-element buffer.
        # acc is donated: with the 8.5 GB table resident, every spare
        # vector-sized buffer counts
        @functools.partial(jax.jit, donate_argnums=(0,))
        def mv_pass(acc, wbuf, v, cb):
            cbt = cb.astype(dt)
            span = wbuf.shape[0]
            w3 = wbuf.reshape(span, row_slices, rows)

            def mv_slice(_, si):
                wd = w3[:, si]
                idx = (wd & jnp.uint32((1 << 25) - 1)).astype(jnp.int32)
                code = (wd >> 25).astype(jnp.int32)
                return None, jnp.sum(cbt[code] * v[idx], axis=0)

            _, p = jax.lax.scan(mv_slice, None, jnp.arange(row_slices))
            return acc + p.reshape(-1)

        @jax.jit
        def mv_start(diags, v):
            return diags.astype(dt) * v

        @functools.partial(jax.jit, donate_argnums=(0,))
        def lanczos_update(V, v, w, j):
            # padded rows encode the exact zero codebook entry — inert
            alpha = jnp.vdot(v[:K], w[:K])
            w = w - alpha * v
            for _ in range(2):
                w = w - V.T @ (V @ w)
            beta = jnp.linalg.norm(w)
            v_next = w / jnp.where(beta > 0, beta, 1.0)
            V = V.at[j].set(v)
            return V, v_next, alpha, beta

        def step(V, v, j):
            w = mv_start(packed_diag, v)
            for wbuf in packed_words:
                w = mv_pass(w, wbuf, v, codebook)
            return lanczos_update(V, v, w, jnp.uint32(j))

        @functools.partial(jax.jit, donate_argnums=(0,))
        def restart(V, S):
            Y = jnp.einsum("mi,mk->ik", jnp.asarray(S, dtype=V.dtype), V)
            Y = Y / jnp.linalg.norm(Y, axis=1, keepdims=True)
            return jnp.zeros_like(V).at[: Y.shape[0]].set(Y)

        def to_device(x_host):
            xp = np.zeros(Kp)
            xp[:K] = x_host[:K]
            return jnp.asarray(xp, dtype=dt)

        return LanczosCallbacks(
            step=step,
            restart=restart,
            row0_host=lambda V: np.asarray(V[0][:K], dtype=np.float64),
            new_basis=lambda: jnp.zeros((m_phase, Kp), dtype=dt),
            to_device=to_device,
        )

    rng = np.random.RandomState(seed)

    if low_memory:
        # two-pass restarted Lanczos (sector.two_pass_lanczos): no stored
        # Krylov basis — peak memory is the 8.5 GB table + four vectors.
        # The thick-restart path (below) OOMs one v5e chip beside the
        # resident table even at m=12 through the axon relay.
        from .sector import two_pass_lanczos

        theta, x = two_pass_lanczos(
            make_matvec(jnp.float32, gather_mode), K, Kp, num_iter=m,
            restarts=restarts, tol=tol, v0_host=rng.standard_normal(K),
            checkpoint_path=checkpoint_path, dtype=jnp.float32,
            name="codebook f32 (two-pass)",
        )
        if polish_restarts > 0:
            ckpt64 = None if checkpoint_path is None else checkpoint_path + ".f64.npz"
            # theta0 deliberately NOT threaded from the f32 phase: f32
            # Ritz values overshoot BELOW the true eigenvalue by ~1e-4
            # near the f32 floor (observed on kagome-36), and a spuriously
            # low best_theta makes every honest f64 value look like a
            # regression
            theta, x = two_pass_lanczos(
                make_matvec(jnp.float64, polish_gather_mode), K, Kp,
                num_iter=min(polish_iter, m),
                restarts=polish_restarts, tol=tol, v0_host=x,
                checkpoint_path=ckpt64, dtype=jnp.float64,
                name="codebook f64 (two-pass)",
            )
        return theta, x

    v0 = np.zeros(Kp)
    v0[:K] = rng.standard_normal(K)
    v0 /= np.linalg.norm(v0)

    cb32 = make_callbacks(jnp.float32, m)
    theta, x = thick_restart_lanczos(
        cb32, cb32.to_device(v0), m, restarts, tol=tol, thick=thick,
        checkpoint_path=checkpoint_path, name="codebook f32",
    )
    if polish_restarts > 0:
        m64 = min(polish_iter, m)
        cb64 = make_callbacks(jnp.float64, m64)
        ckpt64 = None if checkpoint_path is None else checkpoint_path + ".f64.npz"
        # small thick block in f64: the restart transform's Ritz temp is
        # (k, Kp) f64 next to the resident table — keep it ~1 GB
        theta, x = thick_restart_lanczos(
            cb64, cb64.to_device(x), m64, polish_restarts, tol=tol,
            thick=min(thick, 4, m64 - 2), checkpoint_path=ckpt64,
            name="codebook f64", theta0=theta,
        )
    return theta, x
