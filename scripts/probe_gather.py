"""Microbenchmark: gather primitives on the real TPU.

Measures element-gather vs row-gather rates for the layouts considered for
(a) the kagome-36 codebook matvec restructure and (b) the sparse SA engine.
Run from /root/repo (axon plugin registration). Sync via host transfer —
block_until_ready is not a reliable barrier through the relay.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(time.strftime("%H:%M:%S"), *a, file=sys.stderr, flush=True)


log("devices:", jax.devices(), "jax", jax.__version__)

Kp = 31_555_584  # kagome-36 padded
N = 1 << 24
REPS = 8


def bench(fn, *args, label="", n=N, extra=None):
    t0 = time.time()
    float(np.asarray(fn(*args)).sum())  # compile+sync
    log(f"  [compiled {label} in {time.time()-t0:.0f}s]")
    t0 = time.time()
    float(np.asarray(fn(*args)).sum())
    dt = time.time() - t0
    rate = REPS * n / dt
    log(f"{label:42s} {dt:7.3f}s  {rate/1e6:9.1f}M/s"
        + (extra(rate) if extra else ""))
    return rate


key = jax.random.PRNGKey(0)
v1 = jax.random.normal(key, (Kp,), dtype=jnp.float32)
idx = jax.random.randint(jax.random.fold_in(key, 1), (N,), 0, Kp, dtype=jnp.int32)
idx_sorted = jnp.sort(idx)


@jax.jit
def g_elem(v, idx):
    def body(i, acc):
        return acc + jnp.sum(v[idx ^ i])
    return jax.lax.fori_loop(0, REPS, body, 0.0)


@jax.jit
def g_elem_sorted(v, idx):
    def body(i, acc):
        ix = jnp.clip(idx + i, 0, Kp - 1)
        return acc + jnp.sum(jnp.take(v, ix, indices_are_sorted=True))
    return jax.lax.fori_loop(0, REPS, body, 0.0)


bench(g_elem, v1, idx, label="1-elem gather, random idx")
bench(g_elem_sorted, v1, idx_sorted, label="1-elem gather, sorted idx")

for w in (8, 128):
    vw = v1.reshape(Kp // w, w)
    idw = jax.random.randint(
        jax.random.fold_in(key, w), (N,), 0, Kp // w, dtype=jnp.int32
    )

    @jax.jit
    def g_row(v, idx, w=w):
        def body(i, acc):
            return acc + jnp.sum(v[idx ^ i], axis=0)
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((w,), jnp.float32))

    bench(g_row, vw, idw, label=f"row gather ({w}-wide), random idx",
          extra=lambda r, w=w: f"  = {r*w*4/2**30:8.1f} GiB/s")

v8 = v1.reshape(Kp // 8, 8)


@jax.jit
def g_row8_onehot(v, hi, lo):
    def body(i, acc):
        rows = v[hi ^ i]
        oh = jax.nn.one_hot(lo, 8, dtype=jnp.float32)
        return acc + jnp.sum(rows * oh)
    return jax.lax.fori_loop(0, REPS, body, 0.0)


bench(g_row8_onehot, v8, idx >> 3, idx & 7,
      label="8-row gather + one-hot select")

K_sa, R = 49_152, 1024
S = (jax.random.randint(jax.random.fold_in(key, 9), (K_sa, R), 0, 2, jnp.int32)
     .astype(jnp.bfloat16) * 2 - 1)
MD = 512 * 64
ids_sa = jax.random.randint(
    jax.random.fold_in(key, 10), (MD,), 0, K_sa, jnp.int32)


@jax.jit
def g_sa(S, ids):
    def body(i, acc):
        rows = S[ids ^ i].astype(jnp.float32)
        return acc + jnp.sum(rows, axis=0)
    return jax.lax.fori_loop(0, REPS, body, jnp.zeros((R,), jnp.float32))


bench(g_sa, S, ids_sa, label="SA-style row gather (1024-wide bf16)", n=MD,
      extra=lambda r: f"  = {r*R*2/2**30:8.1f} GiB/s")
log("done")
