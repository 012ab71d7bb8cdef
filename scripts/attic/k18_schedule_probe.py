"""A/B the annealing schedule on kagome-18 (CPU, reduced replicas).

The committed kagome-18 curve (geometric ramp over the full ~30-decade
coupling window) plateaus near P(acc) = 0.70 while the reference's
annealer reaches 0.9955 by 1600 sweeps (reference
experiments/heisenberg_kagome_18.csv). Hypothesis: with
--pin-noise-floor the spins whose couplings sit below 1e-12 of the
global scale are overwritten after solving, so the dozens of decades
below that threshold deserve ZERO sweep budget — beta1 should come from
the smallest INFORMATIVE coupling, not the global minimum. This probe
measures P(acc) under pinning semantics for schedule variants at equal
sweep counts.

Run from /root/repo. CPU-only (the TPU belongs to the experiment queue);
uses reduced replicas, so deltas < ~0.1 are noise.
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
from annealing_sign_problem_tpu.ising import make_ising_model  # noqa: E402
from annealing_sign_problem_tpu.io import load_ground_state  # noqa: E402
from annealing_sign_problem_tpu.ops.sweeps_xla import make_color_plan  # noqa: E402
from annealing_sign_problem_tpu.solvers import anneal  # noqa: E402
from annealing_sign_problem_tpu.solvers.sa import (  # noqa: E402
    estimate_betas,
    uninformative_spins,
)

NOISE_FLOOR_RELTOL = 1e-12  # uninformative_spins default reltol
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config  # noqa: E402
from annealing_sign_problem_tpu import systems  # noqa: E402

REPS = 64
SWEEPS = [400, 1600]


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
    mx = absw.max()
    informative = absw[absw >= NOISE_FLOOR_RELTOL * mx]
    print(
        f"couplings: {absw.size} nnz, max {mx:.3e}, min {absw.min()/mx:.3e},"
        f" min informative {informative.min()/mx:.3e}"
        f" ({np.log10(mx/absw.min()):.0f} vs"
        f" {np.log10(mx/informative.min()):.0f} decades)",
        flush=True,
    )
    beta1_inf = float(np.log(100.0) / (4.0 * informative.min()))

    noise_mask = uninformative_spins(h)
    x0_signs = bits_to_signs(model.initial_signs, h.size)
    exact_bits = determine_exact_solution(basis.states, op, psi)
    exact = bits_to_signs(exact_bits, h.size)
    plan = make_color_plan(h)

    b0_lin, b1_full = estimate_betas(h, schedule="linear")
    b0_geo, _ = estimate_betas(h, schedule="geometric")
    print(
        f"beta windows: lin0={b0_lin:.3g} geo0={b0_geo:.3g} "
        f"b1_full={b1_full:.3g} b1_informative={beta1_inf:.3g}",
        flush=True,
    )

    variants = {
        "geometric_full": dict(schedule="geometric"),
        "geometric_informative": dict(schedule="geometric", beta1=beta1_inf),
        "linear_full": dict(schedule="linear"),
        "linear_informative": dict(schedule="linear", beta1=beta1_inf),
    }
    for T in SWEEPS:
        for name, kw in variants.items():
            t1 = time.time()
            res = anneal(
                h, seed=hash((name, T)) % (1 << 31), number_sweeps=T,
                repetitions=REPS, only_best=False, plan=plan, **kw,
            )
            signs = bits_to_signs_batched(res.bits_all, h.size)
            flip = np.where(
                (signs == x0_signs[None, :]).mean(axis=1) >= 0.5, 1.0, -1.0
            )
            signs *= flip[:, None]
            signs[:, noise_mask] = x0_signs[noise_mask]
            agree = signs * exact[None, :]
            acc = np.mean(agree > 0, axis=1)
            acc = np.maximum(acc, 1.0 - acc)
            p = float(np.mean(acc > 0.995))
            print(
                f"T={T:5d} {name:22s} P(acc)={p:.3f} "
                f"mean_acc={acc.mean():.4f} ({time.time()-t1:.0f}s)",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    sys.exit(main())
