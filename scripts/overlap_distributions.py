"""Per-replica overlap DISTRIBUTIONS on kagome-16 (VERDICT r3 item 9).

Our curve CSVs show P(overlap>0.995) == P(acc>0.995) in every row, while
the reference reports P(overlap) ~ 1.0 even at 100 sweeps where its
P(acc) is only 0.55 (reference experiments/heisenberg_kagome_16.csv cols
7-11): its failed replicas sit at overlap ~ 1 with accuracy < 0.995, i.e.
they misorder only tiny-|psi| spins. This script measures OUR engine's
full per-replica (accuracy, overlap) distribution at the low sweep counts
so the failure SHAPES can be compared directly, not just the threshold
probabilities. Runs on CPU (small R) — no TPU contention with the queue.

Output: figures_out/overlap_dist_kagome16.npz + a histogram figure.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from annealing_sign_problem_tpu import systems
from annealing_sign_problem_tpu.amplitudes import (
    determine_exact_solution,
    ground_state_to_log_coeff_fn,
)
from annealing_sign_problem_tpu.bits import bits_to_signs, bits_to_signs_batched
from annealing_sign_problem_tpu.io import basis_from_config, load_ground_state, operator_from_config
from annealing_sign_problem_tpu.ising import make_ising_model
from annealing_sign_problem_tpu.solvers import anneal

SWEEPS = [100, 400, 1600]
R = 256
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "figures_out")


def main():
    name = "heisenberg_kagome_16"
    config = systems.get_system(name)
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    psi, energy, _ = load_ground_state(
        os.path.join("physical_systems", "data-small", f"{name}.h5")
    )
    psi = psi / np.linalg.norm(psi)
    log_fn = ground_state_to_log_coeff_fn(psi, basis)
    model = make_ising_model(basis.states, op, log_psi_fn=log_fn)
    exact_bits = determine_exact_solution(basis.states, op, psi)
    exact = bits_to_signs(exact_bits, model.size)
    w = psi**2 / np.sum(psi**2)

    payload = {}
    for T in SWEEPS:
        res = anneal(
            model.ising_hamiltonian, seed=97 + T, number_sweeps=T,
            repetitions=R, only_best=False,
        )
        signs = bits_to_signs_batched(res.bits_all, model.size)
        agree = signs * exact[None, :]
        acc = np.mean(agree > 0, axis=1)
        acc = np.maximum(acc, 1.0 - acc)
        ov = np.abs(agree @ w)
        payload[f"acc_{T}"] = acc
        payload[f"overlap_{T}"] = ov
        print(
            f"T={T}: P(acc>0.995)={np.mean(acc > 0.995):.3f} "
            f"P(ov>0.995)={np.mean(ov > 0.995):.3f} "
            f"median failed overlap="
            f"{np.median(ov[acc <= 0.995]) if (acc <= 0.995).any() else float('nan'):.3f}"
        )

    os.makedirs(OUT, exist_ok=True)
    np.savez(os.path.join(OUT, "overlap_dist_kagome16.npz"), **payload)

    from annealing_sign_problem_tpu.figures.render import render_overlap_distributions

    path = render_overlap_distributions(
        os.path.join(OUT, "overlap_dist_kagome16.npz"),
        os.path.join(OUT, "overlap_dist_kagome16.png"),
    )
    print("wrote", path)


if __name__ == "__main__":
    main()
