"""Second kagome-18 schedule probe (CPU): headroom above 0.953@1600.

Probe 1 (k18_schedule_probe.py) picked linear-informative cooling
(P(acc) 0.953 @ 1600 vs the reference's 0.9955); this probe A/Bs the
remaining knobs at T=1600 with more replicas: longer zero-T descent,
deeper beta1, and a shallower beta1, to see whether the last ~4 points
are schedule or just glassy replicas. CPU-only (the TPU belongs to the
experiment queue). Run from /root/repo.
"""
import sys
import time

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
T = 1600


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
    print(f"setup {time.time()-t0:.0f}s, K={h.size}", flush=True)

    m = h.exchange.tocoo()
    off = (m.row != m.col) & (m.data != 0.0)
    absw = np.abs(m.data[off])
    mn_inf = absw[absw >= 1e-12 * absw.max()].min()
    b1_inf = float(np.log(100.0) / (4.0 * mn_inf))

    noise_mask = uninformative_spins(h)
    x0_signs = bits_to_signs(model.initial_signs, h.size)
    exact = bits_to_signs(determine_exact_solution(basis.states, op, psi), h.size)
    plan = make_color_plan(h)

    variants = {
        "lin_inf (probe-1 best)": dict(beta1=b1_inf),
        "lin_inf descent=200": dict(beta1=b1_inf, descent_sweeps=200),
        "lin_inf beta1*100": dict(beta1=b1_inf * 100.0),
        "lin_inf beta1/100": dict(beta1=b1_inf / 100.0),
    }
    for name, kw in variants.items():
        t1 = time.time()
        res = anneal(
            h, seed=hash((name, T)) % (1 << 31), number_sweeps=T,
            repetitions=REPS, only_best=False, plan=plan, schedule="linear",
            **kw,
        )
        signs = bits_to_signs_batched(res.bits_all, h.size)
        flip = np.where((signs == x0_signs[None, :]).mean(axis=1) >= 0.5, 1.0, -1.0)
        signs *= flip[:, None]
        signs[:, noise_mask] = x0_signs[noise_mask]
        acc = np.mean(signs * exact[None, :] > 0, axis=1)
        acc = np.maximum(acc, 1.0 - acc)
        p = float(np.mean(acc > 0.995))
        print(
            f"T={T} {name:24s} P(acc)={p:.3f} mean_acc={acc.mean():.4f}"
            f" ({time.time()-t1:.0f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
