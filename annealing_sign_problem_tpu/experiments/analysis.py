"""Full-basis analysis CLIs (common.py:838-1024):

- ``check_greedy_algorithm_quality`` — Table 1 (`make quality_check`)
- ``analyze_influence_of_noise`` + ``postprocess_influence_of_noise`` — Fig 4
- ``analyze_coupling_distribution`` — Fig 3a
- ``analyze_probability_of_frustration`` — Fig 3b
- ``analyze_smallest_amplitude_overlap`` — amplitude-overlap floor

All accept ``--system <name>`` (ED recomputed+cached) or ``--yaml/--hdf5``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..amplitudes import determine_exact_solution, ground_state_to_log_coeff_fn
from ..bits import bits_to_signs
from ..ising import make_ising_model
from ..metrics import compute_accuracy_and_overlap
from ..noise import add_noise_to_amplitudes
from ..solvers import solve_ising_model
from ..utils.log import logger
from ..utils.output import refuse_to_overwrite
from .common import add_system_arguments, load_system, resolve_ground_state


def _load(args):
    op, name = load_system(args)
    psi, energy = resolve_ground_state(op, name, args.hdf5)
    psi = psi / np.linalg.norm(psi)
    return op, psi, energy


def check_greedy_algorithm_quality(argv=None):
    """Greedy quality on the full basis: prints 'accuracy,overlap'
    (common.py:838-856)."""
    parser = argparse.ArgumentParser(
        description="Quality of the greedy optimization algorithm on small systems."
    )
    add_system_arguments(parser)
    args = parser.parse_args(argv)
    op, psi, _ = _load(args)
    exact = determine_exact_solution(op.basis.states, op, psi)
    weights = psi**2
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    x = solve_ising_model(model, mode="greedy")
    accuracy, overlap = compute_accuracy_and_overlap(x, exact, weights)
    print(f"{accuracy},{overlap}")
    return 0


def analyze_influence_of_noise(argv=None):
    """Noise sweep: CSV rows (eps, amplitude_overlap, sign_overlap)
    (common.py:859-903)."""
    parser = argparse.ArgumentParser(
        description="Influence of noise on greedy optimization (small systems)."
    )
    add_system_arguments(parser)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--seed", type=int, required=True)
    parser.add_argument("--min-noise", type=float, default=1e-2)
    parser.add_argument("--max-noise", type=float, default=1e2)
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--repetitions", type=int, default=10)
    parser.add_argument(
        "--resume", action="store_true",
        help="continue an interrupted sweep: completed rows are counted and "
        "their noise draws replayed, so a resumed run emits the identical "
        "remaining rows (the reference target is 1000 steps x 100 reps — "
        "hours on one host core)",
    )
    args = parser.parse_args(argv)
    done = 0
    if args.resume and os.path.exists(args.output):
        from .sampled_connected_components import count_completed_rows

        done = count_completed_rows(args.output)
        logger.info("resuming: {} rows already in {}", done, args.output)
    elif refuse_to_overwrite(args.output):
        return 1

    rng = np.random.RandomState(args.seed)
    op, psi, _ = _load(args)
    exact = determine_exact_solution(op.basis.states, op, psi)
    weights = psi**2
    noise_levels = np.exp(
        np.linspace(np.log(args.min_noise), np.log(args.max_noise), args.steps)
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.output)) or ".", exist_ok=True)
    k = 0
    for i, eps in enumerate(noise_levels):
        if k + args.repetitions <= done:
            # whole step already banked: replay its rng draws only
            for _ in range(args.repetitions):
                add_noise_to_amplitudes(psi, eps=eps, rng=rng)
            k += args.repetitions
            continue
        logger.info("[{}/{}] Testing with eps = {} ...", i + 1, args.steps, eps)
        with open(args.output, "a") as f:
            for _ in range(args.repetitions):
                noisy = add_noise_to_amplitudes(psi, eps=eps, rng=rng)
                k += 1
                if k <= done:
                    continue
                noisy_log_fn = ground_state_to_log_coeff_fn(noisy, op.basis)
                amp_overlap = float(np.dot(np.abs(noisy), np.abs(psi)))
                model = make_ising_model(op.basis.states, op, log_psi_fn=noisy_log_fn)
                x = solve_ising_model(model, mode="greedy")
                _, sign_overlap = compute_accuracy_and_overlap(x, exact, weights)
                f.write(f"{eps},{amp_overlap},{sign_overlap}\n")
    return 0


def postprocess_influence_of_noise(csv_file: str) -> str:
    """Bin by amplitude overlap; 25/50/75 percentiles of the sign overlap
    (common.py:906-937). Returns the output path."""
    table = np.loadtxt(csv_file, delimiter=",")
    edges = np.linspace(0, 1, 101)
    x = 0.5 * (edges[1:] + edges[:-1])
    median = np.full(len(x), np.nan)
    upper = np.full(len(x), np.nan)
    lower = np.full(len(x), np.nan)
    amplitude_overlap = table[:, 1]
    sign_overlap = table[:, 2]
    for i in range(len(x)):
        mask = (edges[i] < amplitude_overlap) & (amplitude_overlap <= edges[i + 1])
        ys = sign_overlap[mask]
        if len(ys) > 0:
            lower[i], median[i], upper[i] = np.percentile(ys, [25, 50, 75])
    name = csv_file.replace(".csv", "_stats.csv")
    with open(name, "w") as f:
        f.write("amplitude_overlap,median,upper,lower\n")
        np.savetxt(f, np.vstack([x, median, upper, lower]).T, delimiter=",")
    return name


def analyze_coupling_distribution(argv=None):
    """Sorted |J| spectrum of the full-basis Ising matrix (common.py:940-960)."""
    parser = argparse.ArgumentParser(description="How are couplings distributed?")
    add_system_arguments(parser)
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args(argv)
    op, psi, _ = _load(args)
    max_coeff = np.max(np.abs(psi))
    logger.info("Max coeff: {}; max log coeff: {}", max_coeff, np.log(max_coeff))
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    matrix = model.ising_hamiltonian.exchange.tocoo()
    off = matrix.row != matrix.col
    couplings = np.sort(np.abs(matrix.data[off]))[::-1]
    np.savetxt(args.output, couplings)
    return 0


def analyze_probability_of_frustration(argv=None):
    """P(bond not frustrated) vs log-binned |J|; NaN below 100 counts
    (common.py:963-1002)."""
    parser = argparse.ArgumentParser(description="How often are couplings frustrated?")
    add_system_arguments(parser)
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args(argv)
    op, psi, _ = _load(args)
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    signs = bits_to_signs(model.initial_signs, model.size)

    matrix = model.ising_hamiltonian.exchange.tocoo()
    off = (matrix.row != matrix.col) & (matrix.data != 0.0)
    rows, cols, data = matrix.row[off], matrix.col[off], matrix.data[off]
    is_frustrated = signs[rows] * signs[cols] * data > 0

    logabs = np.log(np.abs(data))
    max_coupling = logabs.max()
    min_coupling = max(max_coupling - 20, logabs.min())
    logger.debug(
        "min log coupling: {}; max log coupling: {}", min_coupling, max_coupling
    )
    in_range = (min_coupling <= logabs) & (logabs <= max_coupling)
    bins = np.linspace(min_coupling, max_coupling, 50)
    frustrated_pdf, _ = np.histogram(logabs[is_frustrated & in_range], bins=bins)
    normal_pdf, _ = np.histogram(logabs[~is_frustrated & in_range], bins=bins)
    total = normal_pdf + frustrated_pdf
    with np.errstate(divide="ignore", invalid="ignore"):
        y = normal_pdf / total
    y = np.where(total < 100, np.nan, y)
    x = np.exp(0.5 * (bins[:-1] + bins[1:]))
    np.savetxt(args.output, np.vstack([x, y]).T, delimiter=",")
    return 0


def analyze_smallest_amplitude_overlap(argv=None):
    """Overlap of |psi| with random positive vectors — how low can the
    amplitude overlap go (common.py:1005-1024)."""
    parser = argparse.ArgumentParser(
        description="How small can the amplitude overlap get?"
    )
    add_system_arguments(parser)
    parser.add_argument("--trials", default=100, type=int)
    parser.add_argument("--seed", default=12345, type=int)
    args = parser.parse_args(argv)
    rng = np.random.RandomState(args.seed)
    op, psi, _ = _load(args)
    amplitudes = np.abs(psi)
    logger.info("max amplitude: {}", amplitudes.max())
    overlaps = np.zeros(args.trials)
    for i in range(args.trials):
        noise = rng.rand(len(amplitudes))
        overlaps[i] = abs(np.dot(amplitudes, noise)) / np.linalg.norm(noise)
    m = np.percentile(overlaps, [25, 50, 75])
    logger.info(
        "mean: {}, median: {}, interquartile: {}", overlaps.mean(), m[1], m[2] - m[0]
    )
    print(f"{overlaps.mean()},{m[1]},{m[2]-m[0]}")
    return 0


COMMANDS = {
    "quality": check_greedy_algorithm_quality,
    "noise": analyze_influence_of_noise,
    "couplings": analyze_coupling_distribution,
    "frustration": analyze_probability_of_frustration,
    "amplitude-overlap": analyze_smallest_amplitude_overlap,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in COMMANDS:
        print(f"usage: analysis.py {{{','.join(COMMANDS)}}} [options]", file=sys.stderr)
        return 2
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
