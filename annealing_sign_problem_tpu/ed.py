"""Exact diagonalisation: matrix-free Lanczos on the padded term table.

Replaces the reference's external ``SpinED`` Haskell binary (Makefile:2,
README.md:53-59) as the producer of ground states. The Hamiltonian is never
materialised: matvecs use the operator's cached ELL (indices, coefficients)
form, which is a gather + weighted reduction — memory-bandwidth bound and
mesh-shardable over the basis dimension.

Strategy:
- device Lanczos with full reorthogonalisation (f32 on TPU, f64 on CPU);
- optional host refinement pass in float64 (a short Lanczos restart seeded
  with the device Ritz vector) so the sign/amplitude oracle reaches the
  reference's f64 quality even when the device pass ran in f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .operator import Operator

__all__ = ["ground_state", "lanczos", "host_ell_matvec"]


def lanczos(matvec, v0: jax.Array, num_iter: int):
    """Lanczos tridiagonalisation with full reorthogonalisation.

    Returns (alphas (m,), betas (m-1,), V (m, K)). Static shapes; runs
    fully jitted. Full reorthogonalisation keeps the basis numerically
    orthogonal, which matters in f32.
    """
    K = v0.shape[0]
    dtype = v0.dtype
    m = num_iter

    def body(carry, j):
        V, v, beta = carry
        w = matvec(v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v
        # full reorthogonalisation (twice for stability)
        for _ in range(2):
            w = w - V.T @ (V @ w)
        beta_next = jnp.linalg.norm(w)
        v_next = w / jnp.where(beta_next > 0, beta_next, 1.0)
        V = V.at[j].set(v)
        return (V, v_next, beta_next), (alpha, beta_next)

    V0 = jnp.zeros((m, K), dtype=dtype)
    (V, _, _), (alphas, betas) = jax.lax.scan(
        body, (V0, v0, jnp.zeros((), dtype=dtype)), jnp.arange(m)
    )
    return alphas, betas[:-1], V


@functools.partial(jax.jit, static_argnums=(0, 2))
def _lanczos_jit(op: Operator, v0: jax.Array, num_iter: int):
    return lanczos(op.matvec, v0, num_iter)


def host_ell_matvec(idx: np.ndarray, coeffs: np.ndarray, x: np.ndarray,
                    chunk: int = 1 << 18) -> np.ndarray:
    """float64 ELL matvec on the host, chunked to bound peak memory."""
    K = idx.shape[0]
    y = np.empty(K, dtype=np.float64)
    for s in range(0, K, chunk):
        e = min(s + chunk, K)
        y[s:e] = np.einsum("ij,ij->i", coeffs[s:e], x[idx[s:e]])
    return y


def _ritz_smallest(alphas, betas, V):
    """Smallest Ritz pair from the Lanczos tridiagonal."""
    import scipy.linalg

    a = np.asarray(alphas, dtype=np.float64)
    b = np.asarray(betas, dtype=np.float64)
    evals, evecs = scipy.linalg.eigh_tridiagonal(a, b, select="i", select_range=(0, 0))
    theta = float(evals[0])
    s = evecs[:, 0]
    x = np.asarray(V).T.astype(np.float64) @ s
    x /= np.linalg.norm(x)
    return theta, x


def ground_state(
    operator: Operator,
    num_iter: int = 128,
    restarts: int = 4,
    tol: float = 1e-10,
    dtype=None,
    seed: int = 0,
    refine_host: bool = True,
    refine_iter: int = 40,
) -> Tuple[float, np.ndarray]:
    """Ground-state energy and (float64, normalised) eigenvector.

    ``restarts`` thick-restarts the device Lanczos from the current Ritz
    vector; the optional host pass reruns a short f64 Lanczos seeded with
    the device result to polish small-amplitude signs (the accuracy metric
    weighs every basis state equally — common.py:226-227 — so tiny
    amplitudes must have trustworthy signs).
    """
    K = operator.basis.number_states
    if dtype is None:
        dtype = jnp.float32 if jax.default_backend() == "tpu" else jnp.float64
    m = min(num_iter, K)

    rng = np.random.RandomState(seed)
    v0 = rng.standard_normal(K)
    v0 /= np.linalg.norm(v0)
    v = jnp.asarray(v0, dtype=dtype)

    # make sure the ELL cache exists before timing-sensitive loops
    operator.build_ell(dtype=dtype)

    theta, x = np.inf, None
    for r in range(restarts):
        alphas, betas, V = _lanczos_jit(operator, v, m)
        theta_new, x = _ritz_smallest(alphas, betas, V)
        converged = abs(theta_new - theta) < tol * max(1.0, abs(theta_new))
        theta = theta_new
        v = jnp.asarray(x / np.linalg.norm(x), dtype=dtype)
        if converged:
            break

    if refine_host:
        idx, coeffs = operator.build_ell(dtype=jnp.float64)
        idx_h = np.asarray(idx)
        coeffs_h = np.asarray(coeffs, dtype=np.float64)

        mv = lambda z: host_ell_matvec(idx_h, coeffs_h, z)
        theta, x = _host_lanczos(mv, x, min(refine_iter, K), tol)

    x = np.asarray(x, dtype=np.float64)
    x /= np.linalg.norm(x)
    # fix the (arbitrary) global sign for reproducibility: largest-amplitude
    # coefficient is positive
    if x[np.argmax(np.abs(x))] < 0:
        x = -x
    return float(theta), x


def _host_lanczos(matvec, v0: np.ndarray, m: int, tol: float):
    """Short float64 Lanczos with full reorthogonalisation (numpy)."""
    K = v0.shape[0]
    V = np.zeros((m, K), dtype=np.float64)
    alphas = np.zeros(m)
    betas = np.zeros(max(m - 1, 0))
    v = v0.astype(np.float64)
    v /= np.linalg.norm(v)
    for j in range(m):
        V[j] = v
        w = matvec(v)
        alphas[j] = np.dot(v, w)
        w -= alphas[j] * v
        w -= V[: j + 1].T @ (V[: j + 1] @ w)
        w -= V[: j + 1].T @ (V[: j + 1] @ w)
        beta = np.linalg.norm(w)
        if j < m - 1:
            betas[j] = beta
            if beta < 1e-14:
                alphas = alphas[: j + 1]
                betas = betas[:j]
                V = V[: j + 1]
                break
            v = w / beta

    import scipy.linalg

    evals, evecs = scipy.linalg.eigh_tridiagonal(
        alphas, betas[: len(alphas) - 1], select="i", select_range=(0, 0)
    )
    theta = float(evals[0])
    x = V.T @ evecs[:, 0]
    x /= np.linalg.norm(x)
    return theta, x
