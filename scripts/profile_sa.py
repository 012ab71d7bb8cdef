"""Profile the SA kernel's cost components on the real TPU.

Variants (all 200 sweeps, K=12870 kagome-16, R=1024):
  base     — current engine
  norng    — acceptance uses a constant threshold (isolates threefry cost)
  nogather — neighbour signs read via static slice (isolates gather cost)
  rbg      — threefry replaced by lax.rng_bit_generator (hardware RBG)
  bf16     — state in bfloat16 (halves gather traffic)
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_problem
from annealing_sign_problem_tpu.ops.sweeps_xla import (
    make_color_plan,
    _pack_words_host,
)
from annealing_sign_problem_tpu.solvers.sa import estimate_betas


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_kernel(variant, num_spins, num_sweeps, dtype=jnp.float32):
    @functools.partial(jax.jit, static_argnums=())
    def kern(block_spins, neighbours, couplings, field, init_words, betas, seed):
        NB, M = block_spins.shape
        W, R = init_words.shape
        K = num_spins
        Kp1 = K + 1

        shifts = jnp.arange(32, dtype=jnp.uint32)[None, :, None]
        bits = ((init_words[:, None, :] >> shifts) & 1).reshape(W * 32, R)[:K]
        signs0 = jnp.zeros((Kp1, R), dtype=dtype)
        signs0 = signs0.at[:K].set((2 * bits.astype(jnp.int32) - 1).astype(dtype))

        base_key = jax.random.PRNGKey(seed)
        D = neighbours.shape[1]

        def block_step(carry, inputs):
            S, E, rbg_state = carry
            beta, step_index = inputs
            ids = block_spins[step_index % NB]
            if variant == "nogather":
                Sn = jax.lax.dynamic_slice_in_dim(S, 0, M * D, 0).reshape(M, D, R)
            else:
                nbr_ids = neighbours[ids].reshape(-1)
                Sn = S[nbr_ids].reshape(M, D, R)
            w = couplings[ids]
            local = jnp.einsum("mdr,md->mr", Sn.astype(jnp.float32), w)
            s_cur = S[ids]
            delta = -2.0 * s_cur.astype(jnp.float32) * (2.0 * local + field[ids][:, None])
            if variant == "norng":
                u = jnp.full((M, R), 0.5, dtype=jnp.float32)
            elif variant == "rbg":
                rbg_state, rnd = jax.lax.rng_bit_generator(
                    rbg_state, (M, R), dtype=jnp.uint32
                )
                u = rnd.astype(jnp.float32) * (1.0 / 4294967296.0)
            else:
                key = jax.random.fold_in(base_key, step_index)
                u = jax.random.uniform(key, (M, R), dtype=jnp.float32)
            accept = (delta <= 0) | (u < jnp.exp(-beta * delta))
            S = S.at[ids].set(jnp.where(accept, -s_cur, s_cur))
            E = E + jnp.sum(jnp.where(accept, delta, 0.0), axis=0, dtype=jnp.float64)
            return (S, E, rbg_state), None

        def sweep(carry, inputs):
            S, E, rbg, bestS, bestE = carry
            beta, sweep_index = inputs
            steps = sweep_index * NB + jnp.arange(NB)
            (S, E, rbg), _ = jax.lax.scan(
                block_step, (S, E, rbg), (jnp.full(NB, beta), steps)
            )
            better = E < bestE
            bestE = jnp.where(better, E, bestE)
            bestS = jnp.where(better[None, :], S, bestS)
            return (S, E, rbg, bestS, bestE), None

        E0 = jnp.zeros(R, dtype=jnp.float64)
        rbg0 = jnp.zeros((2,), dtype=jnp.uint64) if False else jnp.concatenate(
            [jnp.uint32(seed)[None], jnp.zeros(3, jnp.uint32)]
        )
        carry0 = (signs0, E0, rbg0, signs0, E0)
        (S, E, rbg, bestS, bestE), _ = jax.lax.scan(
            sweep, carry0, (betas, jnp.arange(num_sweeps))
        )
        return E, bestE

    return kern


def make_dense_kernel(num_sweeps, j_dtype=jnp.bfloat16, e_dtype=jnp.float64):
    """Dense MXU engine: spins reordered block-major, local fields are
    (M, Kp) @ (Kp, R) matmuls, state updates are contiguous slices."""

    @jax.jit
    def kern(J, field_b, S0, betas, seed):
        NB, M, Kp = J.shape
        R = S0.shape[1]
        base_key = jax.random.PRNGKey(seed)

        def block_step(carry, inputs):
            S, E = carry
            beta, step_index = inputs
            b = step_index % NB
            Jb = J[b]  # (M, Kp)
            local = jnp.dot(
                Jb, S if S.dtype == j_dtype else S.astype(j_dtype),
                preferred_element_type=jnp.float32,
            )  # (M, R)
            s_cur = jax.lax.dynamic_slice(S, (b * M, 0), (M, R))
            delta = -2.0 * s_cur.astype(jnp.float32) * (2.0 * local + field_b[b][:, None])
            key = jax.random.fold_in(base_key, step_index)
            u = jax.random.uniform(key, (M, R), dtype=jnp.float32)
            accept = (delta <= 0) | (u < jnp.exp(-beta * delta))
            S = jax.lax.dynamic_update_slice(
                S, jnp.where(accept, -s_cur, s_cur), (b * M, 0)
            )
            E = E + jnp.sum(jnp.where(accept, delta, 0.0), axis=0, dtype=e_dtype)
            return (S, E), None

        def sweep(carry, inputs):
            S, E, bestS, bestE = carry
            beta, sweep_index = inputs
            steps = sweep_index * NB + jnp.arange(NB)
            (S, E), _ = jax.lax.scan(block_step, (S, E), (jnp.full(NB, beta), steps))
            better = E < bestE
            bestE = jnp.where(better, E, bestE)
            bestS = jnp.where(better[None, :], S, bestS)
            return (S, E, bestS, bestE), None

        E0 = jnp.zeros(R, dtype=jnp.float64)
        carry0 = (S0, E0, S0, E0)
        (S, E, bestS, bestE), _ = jax.lax.scan(
            sweep, carry0, (betas, jnp.arange(num_sweeps))
        )
        return E, bestE

    return kern


def build_dense(plan):
    """Reorder spins block-major and densify J. Returns (J (NB,M,Kp) f32,
    field (NB,M), perm (Kp,) orig index per reordered row or -1)."""
    NB, M = plan.block_spins.shape
    Kp = NB * M
    perm = plan.block_spins.reshape(-1).astype(np.int64)  # reordered -> orig (K = sentinel)
    K = plan.num_spins
    # orig -> reordered (first occurrence wins; sentinels map nowhere)
    inv = np.full(K + 1, Kp, dtype=np.int64)
    real = perm != K
    inv[perm[real]] = np.nonzero(real)[0]
    J = np.zeros((Kp, Kp + 1), dtype=np.float32)  # extra col absorbs sentinel nbrs
    rows = np.repeat(np.arange(Kp), plan.neighbours.shape[1])
    nbr = plan.neighbours[perm].reshape(-1)  # orig neighbour ids
    w = plan.couplings[perm].reshape(-1)
    J[rows, inv[nbr]] = w
    J = J[:, :Kp]
    field = plan.field[perm].astype(np.float32)
    return (
        J.reshape(NB, M, Kp),
        field.reshape(NB, M),
        perm,
    )


def main():
    model, psi, exact = build_problem()
    h = model.ising_hamiltonian
    plan = make_color_plan(h)
    K = h.size
    R = 1024
    T = 200
    b0, b1 = estimate_betas(h)
    betas = (b0 * (b1 / b0) ** (np.arange(T) / (T - 1))).astype(np.float32)
    rng = np.random.RandomState(0)
    signs0 = 2.0 * rng.randint(0, 2, size=(R, K)).astype(np.float64) - 1.0
    words = _pack_words_host(signs0)
    D = plan.neighbours.shape[1]
    log(f"K={K} R={R} T={T} D={D} NB={plan.num_blocks} M={plan.block_size}")

    variants = sys.argv[1:] or ["base", "norng", "nogather", "rbg", "bf16"]
    for v in variants:
        if v.startswith("dense"):
            j_dtype = jnp.float32 if v == "dense_f32" else jnp.bfloat16
            e_dtype = jnp.float32 if v == "dense_e32" else jnp.float64
            s_np = np.float32
            if v in ("dense_sbf16", "dense_all"):
                s_np = None  # cast below
                e_dtype = jnp.float32 if v == "dense_all" else e_dtype
            bs = 1024 if v == "dense_m1024" else (256 if v == "dense_m256" else 512)
            plan_v = make_color_plan(h, block_size=bs) if bs != 512 else plan
            Jd, field_b, perm = build_dense(plan_v)
            NB, M, Kp = Jd.shape
            log(f"dense J: {Jd.nbytes/(1<<20):.0f} MiB f32 host, Kp={Kp} NB={NB} M={M}")
            kern = make_dense_kernel(T, j_dtype=j_dtype, e_dtype=e_dtype)
            S0 = np.zeros((Kp, R), dtype=np.float32)
            ext = np.concatenate([signs0.T, np.zeros((1, R))], axis=0)  # (K+1, R)
            S0[:] = ext[perm]
            s_jnp = jnp.bfloat16 if v in ("dense_sbf16", "dense_all") else jnp.float32
            args = (
                jnp.asarray(Jd, dtype=j_dtype),
                jnp.asarray(field_b),
                jnp.asarray(S0, dtype=s_jnp),
                jnp.asarray(betas),
                jnp.uint32(42),
            )
            E, bestE = kern(*args)
            jax.block_until_ready((E, bestE))
            t0 = time.perf_counter()
            E, bestE = kern(*args)
            jax.block_until_ready((E, bestE))
            dt = time.perf_counter() - t0
            flips = K * R * T
            log(
                f"{v:9s}: {dt:.3f}s  {flips/dt:.3e} flips/s  "
                f"({dt/T*1e3:.2f} ms/sweep)  bestE={float(bestE.min()):.4f}"
            )
            continue
        dtype = jnp.bfloat16 if v == "bf16" else jnp.float32
        kern = make_kernel("base" if v == "bf16" else v, K, T, dtype=dtype)
        args = (
            jnp.asarray(plan.block_spins),
            jnp.asarray(plan.neighbours),
            jnp.asarray(plan.couplings, dtype=jnp.float32),
            jnp.asarray(plan.field, dtype=jnp.float32),
            jnp.asarray(words),
            jnp.asarray(betas),
            jnp.uint32(42),
        )
        E, bestE = kern(*args)  # compile
        jax.block_until_ready((E, bestE))
        t0 = time.perf_counter()
        E, bestE = kern(*args)
        jax.block_until_ready((E, bestE))
        dt = time.perf_counter() - t0
        flips = K * R * T
        log(
            f"{v:9s}: {dt:.3f}s  {flips/dt:.3e} flips/s  "
            f"({dt/T*1e3:.2f} ms/sweep)  bestE={float(bestE.min()):.4f}"
        )


if __name__ == "__main__":
    main()
