"""Thick-restart Lanczos driver shared by every ED path.

The reference delegates exact diagonalisation to the external SpinED
Haskell binary (PRIMME-based; Makefile:2, README.md:53-59). Here ED is
in-framework, and all four variants (small dense-ELL, large matrix-free,
mesh-sharded, packed-codebook) share ONE host-side restart driver; each
variant only supplies two jitted device callbacks:

- ``step(V, v, j) -> (V, v_next, alpha, beta)``: one Lanczos step with
  full reorthogonalisation against every row of ``V`` (zero rows are
  inert, so the same kernel serves both the cold start and the
  thick-restarted basis).
- ``restart(V, S) -> V'``: a basis transform placing the ``k`` selected
  Ritz vectors ``Y = Sᵀ·V`` in the first rows of a fresh (donated) ``V``.

The driver implements thick restarting (Wu & Simon, SIAM J. Matrix Anal.
2000): instead of collapsing the Krylov space to a single Ritz vector per
restart (the round-1 scheme, which stalled kagome-36 at E=-63.098 vs the
reference -63.12622047596263, heisenberg_kagome_36.yaml:5), the ``k``
lowest Ritz vectors are kept. The projected matrix after a restart is
arrowhead-plus-tridiagonal and is tracked exactly on the host:

    H[i,i]   = θᵢ              i < k   (kept Ritz values)
    H[i,k]   = β_last·S[-1,i]  i < k   (residual couplings)
    H[j,j]   = αⱼ              j ≥ k
    H[j,j+1] = βⱼ              j ≥ k

Robustness (the round-1 "corrupt first f64 restart" bug class):
- a restart whose best Ritz value *regresses* above the running best by
  more than the tolerance is discarded — the driver re-seeds from the
  best vector seen so far with an empty thick block;
- per-restart checkpointing of (θ, x) to an ``.npz`` so relay stalls /
  process deaths lose at most one restart of work.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import numpy as np

from .utils.log import logger

__all__ = ["thick_restart_lanczos", "LanczosCallbacks"]


@dataclass
class LanczosCallbacks:
    """Device callbacks one ED variant supplies to the shared driver."""

    # (V, v, j:int) -> (V, v_next, alpha, beta); full reorth vs all rows of V
    step: Callable
    # (V, S:(m,k)) -> V' with rows [0:k] = normalised Sᵀ·V, rows [k:] = 0
    restart: Callable
    # V -> first row as a host float64 array of length K (un-padded)
    row0_host: Callable
    # fresh zero V of shape (m, Kp) in the working dtype
    new_basis: Callable
    # host float64 vector (Kp,) -> device vector in the working dtype
    to_device: Callable


def _projected_eigh(H: np.ndarray, mj: int, k_kept: int):
    """Lowest eigenpairs of the projected matrix (dense for generality:
    after a thick restart H is arrowhead+tridiagonal, not tridiagonal)."""
    import scipy.linalg

    evals, evecs = scipy.linalg.eigh(H[:mj, :mj])
    return evals, evecs


def thick_restart_lanczos(
    cb: LanczosCallbacks,
    v0,
    m: int,
    restarts: int,
    tol: float = 1e-9,
    thick: int = 6,
    checkpoint_path: Optional[str] = None,
    name: str = "lanczos",
    theta0: float = np.inf,
) -> Tuple[float, np.ndarray]:
    """Run restarted Lanczos; returns (theta, x_host_f64).

    ``v0`` is a device vector (already in the working dtype, padded to the
    variant's Kp). If ``checkpoint_path`` exists, the run resumes from the
    stored Ritz vector instead of ``v0``.
    """
    thick = max(0, min(thick, m - 2))
    best_theta, best_x = theta0, None

    if checkpoint_path is not None and os.path.exists(checkpoint_path):
        data = np.load(checkpoint_path)
        best_theta = float(data["theta"])
        logger.info("{}: resuming from checkpoint (E = {:.12f})", name, best_theta)
        x0 = data["x"].astype(np.float64)
        v = cb.to_device(x0 / np.linalg.norm(x0))
        theta0 = best_theta
    else:
        v = v0

    V = cb.new_basis()
    k = 0  # current thick-block size
    thetas_kept = np.zeros(0)
    b_kept = np.zeros(0)
    theta = theta0

    for r in range(restarts):
        t0 = time.time()
        H = np.zeros((m, m))
        if k:
            H[:k, :k] = np.diag(thetas_kept)
            H[:k, k] = b_kept
            H[k, :k] = b_kept
        alphas_scale = max(np.abs(thetas_kept).max(), 1e-30) if k else 1e-30
        mj = m
        beta = 0.0
        for j in range(k, m):
            V, v, a_j, b_j = cb.step(V, v, j)
            a_j, beta = float(a_j), float(b_j)
            H[j, j] = a_j
            alphas_scale = max(alphas_scale, abs(a_j))
            if j < m - 1:
                H[j, j + 1] = H[j + 1, j] = beta
            # breakdown: the Krylov space is exhausted at working precision;
            # later coefficients would be noise (the classic f32 failure
            # mode that produced spurious eigenvalues in round 1)
            if beta < 1e-6 * alphas_scale and j < m - 1:
                mj = j + 1
                H[j, j + 1] = H[j + 1, j] = 0.0
                break

        evals, evecs = _projected_eigh(H, mj, k)
        theta_new = float(evals[0])
        k_new = min(thick, mj - 1) if mj == m else 0
        S = evecs[:, : max(k_new, 1)]
        res0 = abs(beta * S[-1, 0])

        regressed = theta_new > min(best_theta, theta) + max(
            10 * tol * max(1.0, abs(theta_new)), 1e-8
        )
        logger.info(
            "{} restart {}: E = {:.12f} (res {:.2e}, {:.0f}s){}",
            name, r, theta_new, res0, time.time() - t0,
            "  ** regressed — discarding restart" if regressed else "",
        )
        if regressed and best_x is not None:
            # corrupt restart (relay hiccup / precision event): reseed from
            # the best Ritz vector seen and drop the thick block
            v = cb.to_device(best_x / np.linalg.norm(best_x))
            V = cb.new_basis()
            k = 0
            thetas_kept = np.zeros(0)
            b_kept = np.zeros(0)
            continue

        # transform the basis: rows [0:k_new] become the kept Ritz vectors
        Sm = np.zeros((m, max(k_new, 1)))
        Sm[:mj] = S[:mj]
        V = cb.restart(V, Sm)  # row 0 of V is now the best Ritz vector
        x_host = cb.row0_host(V)

        converged = (
            abs(theta_new - theta) < tol * max(1.0, abs(theta_new)) or mj < m
        )
        theta = theta_new
        if theta_new <= best_theta:
            best_theta, best_x = theta_new, x_host
            if checkpoint_path is not None:
                tmp = checkpoint_path + ".wip.npz"
                np.savez(tmp, theta=theta_new, x=x_host)
                os.replace(tmp, checkpoint_path)

        if converged:
            break
        # continue the outer iteration: thick block = rows [0:k_new],
        # residual couplings b_i = beta·S[-1,i], next vector = v (residual)
        k = k_new
        thetas_kept = evals[:k_new].copy()
        b_kept = beta * S[-1, :k_new].copy()

    if best_x is None:
        best_x = cb.row0_host(V)
        best_theta = theta
    x = best_x.astype(np.float64)
    x /= np.linalg.norm(x)
    if x[np.argmax(np.abs(x))] < 0:
        x = -x
    return best_theta, x
