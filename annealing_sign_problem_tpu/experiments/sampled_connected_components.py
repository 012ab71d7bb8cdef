"""Large-system cluster pipeline (`make kagome_36 / pyrochlore_32 / sk_32_1`;
Figures 6-8 — the flagship workload).

Monte-Carlo-sample cluster seeds from |psi|^p, grow stochastic clusters
through Hamiltonian connectivity, extend them order times via K <- K ∪ H·K
with global-cutoff sparsification, solve each with the deterministic greedy
solver (and optionally SA), and append one CSV row per cluster with
accuracy/overlap per extension order. Mirrors the reference driver
(sampled_connected_components.py:619-830: CSV schema :672-693, provenance
header :804-816) and adds the work-distribution options that replace its
SLURM JOBID fan-out (--num-workers/--worker-id, SURVEY §2.4 P4).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

from ..amplitudes import ground_state_to_log_coeff_fn
from ..bits import signs_to_bits
from ..ising import make_hamiltonian_extension, make_ising_model, sparsify_using_global_cutoff
from ..metrics import compute_accuracy_and_overlap
from ..noise import add_noise_to_amplitudes, amplitude_overlap
from ..parallel import distribute_clusters
from ..sampling import create_small_cluster_around_point, monte_carlo_sampling, random_cluster_size
from ..solvers import solve_ising_model
from ..utils.log import logger
from ..utils.output import provenance_header, refuse_to_overwrite
from .common import add_system_arguments, load_system, resolve_ground_state


@dataclasses.dataclass
class OptimizationResult:
    """One (cluster, extension order) outcome — CSV row fragment
    (sampled_connected_components.py:672-693)."""

    size: int
    greedy_accuracy: float
    greedy_overlap: float
    sa_accuracy: float
    sa_overlap: float
    amplitude_overlap: float

    def to_csv_str(self) -> str:
        return "{},{:.8e},{:.8e},{:.8e},{:.8e},{:.8e}".format(
            self.size,
            self.greedy_accuracy,
            self.greedy_overlap,
            self.sa_accuracy,
            self.sa_overlap,
            self.amplitude_overlap,
        )

    @staticmethod
    def csv_header() -> str:
        return "size,greedy_accuracy,greedy_overlap,sa_accuracy,sa_overlap,amplitude_overlap"


def count_completed_rows(path: str) -> int:
    """Count completed data rows for ``--resume``, repairing a truncated
    trailing line first: a run killed mid-row-write leaves a partial final
    line (no newline) that must be re-run, not counted as done — counting
    it would permanently skip that cluster AND leave a corrupt row in the
    CSV (ADVICE r4)."""
    with open(path, "r+") as f:
        content = f.read()
        if content and not content.endswith("\n"):
            cut = content.rfind("\n") + 1
            logger.warning("dropping truncated trailing line in {}", path)
            f.seek(cut)
            f.truncate()
            content = content[:cut]
    return sum(
        1 for ln in content.splitlines() if ln.strip() and not ln.startswith("#")
    )


def parse_command_line(argv=None):
    parser = argparse.ArgumentParser(
        description="Sign reconstruction on sampled connected clusters (large systems)."
    )
    add_system_arguments(parser)
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--order", type=int, required=True)
    parser.add_argument("--noise", type=float, default=0)
    parser.add_argument("--annealing", default=True, action=argparse.BooleanOptionalAction)
    parser.add_argument("--global-cutoff", type=float, default=1e-4)
    parser.add_argument("--number-samples", type=int, default=5)
    parser.add_argument("--number-sweeps", type=int, default=5000)
    parser.add_argument("--repetitions", type=int, default=64)
    parser.add_argument("--min-cluster-size", type=int, default=50)
    parser.add_argument("--max-cluster-size", type=int, default=1000)
    parser.add_argument("--sampled-power", type=float, default=0.1)
    parser.add_argument("--keep-probability", type=float, default=0.5)
    parser.add_argument("--seed", type=int, default=12345)
    parser.add_argument(
        "--resume", action="store_true",
        help="continue an interrupted batch: count the data rows already "
             "in --output and skip that many work items (the scatter is "
             "deterministic in --seed, so the continuation is exact)",
    )
    parser.add_argument("--num-workers", type=int, default=1,
                        help="total parallel workers (replaces SLURM array jobs)")
    parser.add_argument("--worker-id", type=int, default=0)
    return parser.parse_args(argv)


def solve_and_test_model(h, frozen_spins, exact_signs, weights, annealing, args, seed):
    x = solve_ising_model(h, mode="greedy", frozen_spins=frozen_spins)
    greedy_accuracy, greedy_overlap = compute_accuracy_and_overlap(
        x, exact_signs, weights
    )
    logger.info(
        "Greedy: accuracy: {:.3f}; overlap: {:.3f}", greedy_accuracy, greedy_overlap
    )
    if annealing:
        x = solve_ising_model(
            h,
            mode="sa",
            frozen_spins=frozen_spins,
            seed=seed,
            number_sweeps=args.number_sweeps,
            repetitions=args.repetitions,
            bucket=True,  # bounded kernel-shape set across the cluster stream
        )
        sa_accuracy, sa_overlap = compute_accuracy_and_overlap(x, exact_signs, weights)
        logger.info("SA:     accuracy: {:.3f}; overlap: {:.3f}", sa_accuracy, sa_overlap)
    else:
        sa_accuracy = sa_overlap = float("nan")

    return OptimizationResult(
        size=h.size,
        greedy_accuracy=greedy_accuracy,
        greedy_overlap=greedy_overlap,
        sa_accuracy=sa_accuracy,
        sa_overlap=sa_overlap,
        amplitude_overlap=float("nan"),
    )


def process_cluster(cluster, op, ground_state, noisy_ground_state, noisy_log_fn, args, rng):
    """Order-0 model plus ``order`` extensions; one OptimizationResult per
    order (sampled_connected_components.py:726-751)."""
    basis = op.basis
    exact_psi = ground_state[basis.index(cluster)]
    exact_signs = signs_to_bits(np.sign(exact_psi))
    weights = exact_psi**2
    weights /= weights.sum()

    results = []
    h = None
    for i in range(args.order + 1):
        t0 = time.time()
        if i == 0:
            h = make_ising_model(cluster, op, log_psi_fn=noisy_log_fn)
            logger.debug("Extension {}: there are {} spins in the cluster", 0, h.size)
        else:
            h = make_hamiltonian_extension(h, noisy_log_fn)
            logger.debug(
                "Extension {}: there are now {} spins in the cluster", i, h.size
            )
            h = sparsify_using_global_cutoff(h, args.global_cutoff, cluster)
        t1 = time.time()
        r = solve_and_test_model(
            h, cluster, exact_signs, weights, args.annealing, args,
            seed=int(rng.randint(1 << 31)),
        )
        t2 = time.time()
        r.amplitude_overlap = amplitude_overlap(
            h.spins, ground_state, noisy_ground_state, basis
        )
        logger.debug(
            "order {}: build {:.1f}s, solve {:.1f}s, overlap {:.1f}s",
            i, t1 - t0, t2 - t1, time.time() - t2,
        )
        results.append(r)
    return results


def main(argv=None):
    args = parse_command_line(argv)
    out_probe = args.output if args.num_workers <= 1 else f"{args.output}.{args.worker_id}"
    done = 0
    if args.resume and os.path.exists(out_probe):
        # per-cluster rows are append-only and the work-item scatter is
        # deterministic in --seed, so counting data rows and skipping that
        # many items continues a batch exactly where a relay stall / rc=1
        # death left it (the round-3 pyrochlore cells died twice at
        # UNAVAILABLE with 0 rows banked — resume turns that into progress)
        done = count_completed_rows(out_probe)
        logger.info("resuming: {} clusters already in {}", done, out_probe)
    elif refuse_to_overwrite(args.output):
        return 1

    op, name = load_system(args)
    psi, _ = resolve_ground_state(op, name, args.hdf5)

    seed_rng = np.random.RandomState(args.seed)
    if args.noise > 0:
        noisy_psi = add_noise_to_amplitudes(psi, args.noise, rng=seed_rng)
    else:
        noisy_psi = psi
    noisy_log_fn = ground_state_to_log_coeff_fn(noisy_psi, op.basis)

    logger.info("Monte Carlo sampling ...")
    sampling = monte_carlo_sampling(
        op.basis.states,
        psi,
        number_samples=args.number_samples,
        sampled_power=args.sampled_power,
        rng=seed_rng,
    )

    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    out_path = args.output
    if args.num_workers > 1:
        out_path = f"{args.output}.{args.worker_id}"
    if done == 0:
        with open(out_path, "w") as f:
            f.write(
                provenance_header(
                    "annealing_sign_problem_tpu.experiments.sampled_connected_components",
                    {
                        "seed": args.seed,
                        "order": args.order,
                        "noise": args.noise,
                        "global_cutoff": args.global_cutoff,
                        "sampled_power": args.sampled_power,
                        "min_cluster_size": args.min_cluster_size,
                        "max_cluster_size": args.max_cluster_size,
                        "keep_probability": args.keep_probability,
                        "number_sweeps": args.number_sweeps,
                        "repetitions": args.repetitions,
                        "worker": f"{args.worker_id}/{args.num_workers}",
                    },
                )
            )
            f.write("# " + OptimizationResult.csv_header() + "\n")

    logger.info("Optimizing clusters ...")
    items = distribute_clusters(
        args.number_samples, args.seed, args.num_workers, args.worker_id
    )
    for i, rng in items[done:]:
        seed_spin = sampling.spins[i]
        size = random_cluster_size(args.min_cluster_size, args.max_cluster_size, rng)
        t_grow = time.time()
        cluster = np.asarray(
            create_small_cluster_around_point(
                seed_spin, op, required_size=size,
                keep_probability=args.keep_probability, rng=rng,
            ),
            dtype=np.uint64,
        )
        logger.debug("cluster {}: grown to {} in {:.1f}s", i, len(cluster), time.time() - t_grow)
        columns = process_cluster(cluster, op, psi, noisy_psi, noisy_log_fn, args, rng)
        line = ",".join(r.to_csv_str() for r in columns)
        with open(out_path, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
