"""Fourth kagome-18 probe (CPU): restart-split sweep budgets.

Probe 3 measured single-chain P(acc) = 0.734/0.805/0.914 at T =
100/200/400 (128 chains, linear-informative + pin). Independent restarts
predict 1-(1-P(T/n))^n: 2x100 ~ 0.93 at T=200, 4x100 ~ 0.995 at T=400,
8x100 ~ 0.9997 at T=800 — all above the reference (0.810/0.9355/0.976)
at conserved sweep budgets. Measure the real thing (the prediction
assumes exact independence AND that the energy argmin picks the
converged chain; both should hold by construction).
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
REF = {100: 0.628, 200: 0.810, 400: 0.9355, 800: 0.976, 1600: 0.9955}


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

    cases = [(200, 2), (400, 4), (800, 8), (1600, 8)]
    for T, n in cases:
        t1 = time.time()
        res = anneal(
            h, seed=hash((T, n, "p4")) % (1 << 31), number_sweeps=T,
            repetitions=REPS, only_best=False, plan=plan, schedule="linear",
            beta1=b1_inf, restarts=n,
        )
        signs = bits_to_signs_batched(res.bits_all, h.size)
        flip = np.where((signs == x0_signs[None, :]).mean(axis=1) >= 0.5, 1.0, -1.0)
        signs *= flip[:, None]
        signs[:, noise_mask] = x0_signs[noise_mask]
        acc = np.mean(signs * exact[None, :] > 0, axis=1)
        acc = np.maximum(acc, 1.0 - acc)
        p = float(np.mean(acc > 0.995))
        print(
            f"T={T:4d} restarts={n} P(acc)={p:.3f} (ref {REF[T]:.3f}) "
            f"mean_acc={acc.mean():.4f} ({time.time()-t1:.0f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
