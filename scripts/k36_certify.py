"""Certify the kagome-36 ground-state energy in f64 without the f64
Lanczos polish (whose resident-vector programs exceed the relay's
per-program buffer wall; see scale.ground_state_codebook docstring).

One streaming f64 matvec y = H x over the cached packed-table blocks
(/root/k36_blocks): each block is a ~35 MB dispatch next to the resident
253 MB f64 vector — far below the wall — and y accumulates on the host.
From y we report, all in f64:

  E      = <x|H|x>            (a rigorous *upper bound* on E0)
  ||r||  = ||Hx - Ex||        (min_i |lambda_i - E| <= ||r||)
  Temple = E - ||r||^2 / gap  (lower bound, given a spectral-gap bound)

The packed codes are decoded through an f64 codebook rebuilt from the
operator's exact f64 off-diagonal values x stabiliser-norm ratios, so H
here is the exact sector Hamiltonian, not its f32 rounding, whenever the
f64 candidate set maps 1:1 onto the stored f32 codebook (checked; falls
back to the f32 codebook with a documented ~1e-7 element error bound
otherwise).

Reference check: E0 = -63.12622047596263
(/root/reference/physical_systems/heisenberg_kagome_36.yaml:5).
"""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from annealing_sign_problem_tpu import systems
from annealing_sign_problem_tpu.io import (
    basis_from_config,
    load_ground_state,
    operator_from_config,
)
from annealing_sign_problem_tpu.scale import build_basis_at_scale
from annealing_sign_problem_tpu.utils.log import logger

BLOCKS = sys.argv[1] if len(sys.argv) > 1 else "/root/k36_blocks"
H5 = (
    sys.argv[2]
    if len(sys.argv) > 2
    else "physical_systems/data-small/heisenberg_kagome_36.h5"
)
E0_REF = -63.12622047596263

t0 = time.time()
config = systems.get_system("heisenberg_kagome_36")
basis = basis_from_config(config)
build_basis_at_scale(
    basis, cache_path="physical_systems/data-small/heisenberg_kagome_36_basis.npz"
)
op = operator_from_config(config, basis)
K = basis.number_states

# ---- f64 codebook reconstruction (mirrors ground_state_codebook's) --------
offs = np.unique(op._offdiag_table)
offs = offs[offs != 0.0]
u = np.unique(basis.norms)
ratios = np.unique(np.sqrt(np.outer(u, 1.0 / u)).reshape(-1))
cand64 = np.unique(
    np.concatenate(
        [np.outer(offs, ratios).reshape(-1), -np.outer(offs, ratios).reshape(-1), [0.0]]
    )
)
cb32 = np.unique(cand64.astype(np.float32))
# map each stored f32 code id -> the exact f64 value it encodes
cand32 = cand64.astype(np.float32)
exact_ok = len(np.unique(cand32)) == len(cand64)
if exact_ok:
    order = np.searchsorted(cb32, cand32)
    cb64 = np.zeros(len(cb32))
    cb64[order] = cand64
    logger.info("codebook: {} entries, f32->f64 mapping is 1:1 (H exact)", len(cb32))
else:
    cb64 = cb32.astype(np.float64)
    logger.info(
        "codebook: {} f32 entries from {} f64 candidates -> element error <= "
        "{:.1e} (f32 rounding)",
        len(cb32), len(cand64), np.max(np.abs(cb32) * 2 ** -24),
    )
cb_dev = jnp.asarray(cb64)

psi, e_stored, _ = load_ground_state(H5)
x = psi.astype(np.float64)
x /= np.linalg.norm(x)
files = sorted(glob.glob(f"{BLOCKS}/block_*.npz"))
rows_total = sum(np.load(f)["diags"].shape[0] for f in files[-1:]) + 122880 * (
    len(files) - 1
)
Kp = rows_total
logger.info("K = {}, Kp = {} in {} blocks; E(stored) = {}", K, Kp, len(files), e_stored)
xp = np.zeros(Kp)
xp[:K] = x
v_dev = jnp.asarray(xp)


@jax.jit
def block_y(words, diags, v_diag, v):
    idx = (words & jnp.uint32((1 << 25) - 1)).astype(jnp.int32)
    code = (words >> 25).astype(jnp.int32)
    off = jnp.sum(cb_dev[code] * v[idx], axis=1)
    return diags.astype(jnp.float64) * v_diag + off


y = np.zeros(Kp)
row0 = 0
for i, f in enumerate(files):
    d = np.load(f)
    words, diags = d["words"], d["diags"]
    n = words.shape[0]
    y[row0 : row0 + n] = np.asarray(
        block_y(jnp.asarray(words), jnp.asarray(diags), v_dev[row0 : row0 + n], v_dev)
    )
    row0 += n
    if (i + 1) % 32 == 0 or i == len(files) - 1:
        logger.info("matvec: {}/{} blocks ({:.0f}s)", i + 1, len(files), time.time() - t0)

assert row0 == Kp
y = y[:K]
x = xp[:K]
E = float(x @ y)
r = y - E * x
rnorm = float(np.linalg.norm(r))
print(f"E_f64   = {E:.14f}  (reference E0 = {E0_REF})")
print(f"E - E0  = {E - E0_REF:.3e}")
print(f"||r||   = {rnorm:.3e}  ->  E0 in [E - ||r||, E] = [{E - rnorm:.10f}, {E:.10f}]")
for gap in (0.05, 0.1, 0.2):
    print(
        f"Temple (gap >= {gap}): E0 >= {E - rnorm ** 2 / gap:.12f} "
        f"(width {rnorm ** 2 / gap:.2e})"
    )
print(f"total {time.time() - t0:.0f}s", flush=True)
