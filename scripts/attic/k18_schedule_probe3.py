"""Third kagome-18 schedule probe (CPU): close the LOW-sweep-count gap.

Probe 2 showed a 200-sweep zero-T descent lifts T=1600 from 0.977 to
0.992 (reference: 0.9955). The remaining losing points are the low sweep
counts (reference: 0.628 @100, 0.810 @200, 0.9355 @400, 0.976 @800);
probe 1 measured only 0.859 @400 with the default 20-sweep descent.
A/B the descent budget at T in {100, 200, 400, 800} — the descent runs
on the exact-f32 sparse engine and converts near-converged glassy
replicas, which should matter MOST at small T. CPU-only (the TPU belongs
to the experiment queue). Run from /root/repo.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from annealing_sign_problem_tpu.amplitudes import (  # noqa: E402
    determine_exact_solution,
    ground_state_to_log_coeff_fn,
)
from annealing_sign_problem_tpu.bits import (  # noqa: E402
    bits_to_signs,
    bits_to_signs_batched,
)
from annealing_sign_problem_tpu.io import (  # noqa: E402
    basis_from_config,
    load_ground_state,
    operator_from_config,
)
from annealing_sign_problem_tpu.ising import make_ising_model  # noqa: E402
from annealing_sign_problem_tpu.ops.sweeps_xla import make_color_plan  # noqa: E402
from annealing_sign_problem_tpu.solvers import anneal  # noqa: E402
from annealing_sign_problem_tpu.solvers.sa import uninformative_spins  # noqa: E402
from annealing_sign_problem_tpu import systems  # noqa: E402

REPS = 128
REF = {100: 0.628, 200: 0.810, 400: 0.9355, 800: 0.976}


def main():
    t0 = time.time()
    cfg = systems.get_system("heisenberg_kagome_18")
    basis = basis_from_config(cfg).build()
    op = operator_from_config(cfg, basis)
    psi, _, _ = load_ground_state(
        "physical_systems/data-small/heisenberg_kagome_18.h5"
    )
    psi = np.asarray(psi) / np.linalg.norm(psi)
    log_fn = ground_state_to_log_coeff_fn(psi, basis)
    model = make_ising_model(basis.states, op, log_psi_fn=log_fn)
    h = model.ising_hamiltonian

    m = h.exchange.tocoo()
    off = (m.row != m.col) & (m.data != 0.0)
    absw = np.abs(m.data[off])
    mn_inf = absw[absw >= 1e-12 * absw.max()].min()
    b1_inf = float(np.log(100.0) / (4.0 * mn_inf))

    noise_mask = uninformative_spins(h)
    x0_signs = bits_to_signs(model.initial_signs, h.size)
    exact = bits_to_signs(determine_exact_solution(basis.states, op, psi), h.size)
    plan = make_color_plan(h)
    print(f"setup {time.time()-t0:.0f}s, K={h.size}", flush=True)

    cases = []
    for T in (400, 100, 200, 800):
        cases.append((T, 20))
        cases.append((T, 200))
    for T, d in cases:
        t1 = time.time()
        res = anneal(
            h, seed=hash((T, d)) % (1 << 31), number_sweeps=T,
            repetitions=REPS, only_best=False, plan=plan, schedule="linear",
            beta1=b1_inf, descent_sweeps=d,
        )
        signs = bits_to_signs_batched(res.bits_all, h.size)
        flip = np.where((signs == x0_signs[None, :]).mean(axis=1) >= 0.5, 1.0, -1.0)
        signs *= flip[:, None]
        signs[:, noise_mask] = x0_signs[noise_mask]
        acc = np.mean(signs * exact[None, :] > 0, axis=1)
        acc = np.maximum(acc, 1.0 - acc)
        p = float(np.mean(acc > 0.995))
        print(
            f"T={T:4d} descent={d:3d} P(acc)={p:.3f} (ref {REF[T]:.3f}) "
            f"mean_acc={acc.mean():.4f} ({time.time()-t1:.0f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
