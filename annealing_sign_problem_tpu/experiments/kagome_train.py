"""Kagome sign-network training entry points.

The reference's kagome_12_supervised / kagome_36_supervised /
kagome_36_annealing drivers (train.py:1405-1717): train a
lattice-convolution sign network on a kagome cluster, either supervised on
exact signs ('cheat' labels) or through the full SA <-> NN self-training
loop (sampled_power=1.5, 100k samples, 2 outer iterations for the
36-site run — train.py:1626,1639,1675). Falls back to a dense network for
systems without a lattice-convolution adjacency table.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..models import DenseSignModel, KagomeSignNetwork
from ..train import (
    TrainingConfig,
    compute_metrics_on_full_space,
    find_ground_state,
    init_sign_model,
    make_optimizer,
    optimize_sign_structure,
    tune_neural_network,
)
from ..utils.log import logger
from ..utils.metrics_writer import MetricsWriter
from .common import add_system_arguments, load_system, resolve_ground_state


def parse_command_line(argv=None):
    parser = argparse.ArgumentParser(description="Kagome sign-network training.")
    add_system_arguments(parser)
    parser.add_argument("--mode", choices=["supervised", "annealing"], default="supervised")
    parser.add_argument("--output", type=str, default="kagome_run")
    parser.add_argument("--channels", type=int, default=28)
    parser.add_argument("--number-samples", type=int, default=5000)
    parser.add_argument("--epochs", type=int, default=300)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--learning-rate", type=float, default=1e-1)
    parser.add_argument("--momentum", type=float, default=0.0,
                        help="SGD momentum (reference kagome_36_annealing: "
                             "0.8, train.py:1612)")
    parser.add_argument("--optimizer", type=str, default="sgd")
    parser.add_argument(
        "--model", choices=["auto", "kagome", "dense"], default="auto",
        help="'kagome': lattice-convolution sign net; 'dense': the "
             "8x64 batchnorm MLP the reference's kagome_36_annealing "
             "actually trains (train.py:1632); 'auto': kagome when an "
             "adjacency table exists")
    parser.add_argument("--sampled-power", type=float, default=1.5)
    parser.add_argument("--number-outer-iterations", type=int, default=2)
    parser.add_argument("--number-sa-sweeps", type=int, default=10000)
    parser.add_argument(
        "--sa-repetitions", type=int, default=64,
        help="annealing replicas per outer-loop label solve; the flip "
             "budget is K * sweeps * repetitions, so large sampled sets "
             "(reference scale: 100k samples -> K ~ 1e5) need this scaled "
             "down to fit a TPU time budget",
    )
    parser.add_argument("--seed", type=int, default=12345)
    parser.add_argument(
        "--sa-engine", type=str, default="auto",
        choices=["auto", "dense", "slab", "sparse"],
        help="annealer engine for the label solves (solvers.sa.anneal)")
    parser.add_argument(
        "--metrics-subsample", type=int, default=None,
        help="estimate the full-space accuracy/overlap from this many "
             "sampled states instead of all of them (unbiased, stderr "
             "~N^-1/2; see train.loop.compute_metrics_on_full_space)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    op, name = load_system(args)
    psi, _ = resolve_ground_state(op, name, args.hdf5)
    psi = psi / np.linalg.norm(psi)
    n = op.basis.number_spins

    if args.model == "dense" or (args.model == "auto" and n not in (12, 36)):
        if args.model == "auto":
            logger.warning(
                "no lattice-convolution table for {} spins; using DenseSignModel", n
            )
        model = DenseSignModel(number_spins=n, features=(64,) * 8,
                               use_batchnorm=True)
    else:
        model = KagomeSignNetwork(number_spins=n, channels=args.channels)

    opt_kwargs = {}
    if args.optimizer == "sgd" and args.momentum:
        opt_kwargs["momentum"] = args.momentum
    state = init_sign_model(
        model, op.basis.states[:8],
        make_optimizer(args.optimizer, args.learning_rate, **opt_kwargs),
        seed=args.seed,
    )
    writer = MetricsWriter(args.output)
    rng = np.random.RandomState(args.seed)

    if args.mode == "supervised":
        # sample ~ |psi|^2 and label with exact signs (the reference's
        # cheat=True supervised sanity loop)
        p = psi**2
        p /= p.sum()
        idx = rng.choice(op.basis.number_states, size=args.number_samples,
                         replace=True, p=p)
        spins, labels, counts = optimize_sign_structure(
            op.basis.states[idx], op, ground_state=psi, cheat=True
        )

        def on_epoch_end(epoch, epochs, loss, accuracy=None):
            if epoch % 50 == 0:
                info = compute_metrics_on_full_space(
                    op.basis, psi, state, subsample=args.metrics_subsample
                )
                logger.debug(
                    "[{}/{}]: loss = {}, accuracy = {}, overlap = {}",
                    epoch, epochs, loss, info["accuracy"], info["overlap"],
                )
                writer.scalars(info, epoch)
            writer.scalar("loss", loss, epoch)

        info = compute_metrics_on_full_space(
            op.basis, psi, state, subsample=args.metrics_subsample
        )
        logger.info("Accuracy: {}; overlap: {}", info["accuracy"], info["overlap"])
        tune_neural_network(
            state, spins, labels, weights=counts,
            epochs=args.epochs, batch_size=args.batch_size,
            seed=args.seed, on_epoch_end=on_epoch_end,
        )
    else:
        config = TrainingConfig(
            number_sa_sweeps=args.number_sa_sweeps,
            sa_repetitions=args.sa_repetitions,
            number_supervised_epochs=args.epochs,
            number_monte_carlo_samples=args.number_samples,
            number_outer_iterations=args.number_outer_iterations,
            train_batch_size=args.batch_size,
            sampled_power=args.sampled_power,
            output=args.output,
            seed=args.seed,
            sa_engine=args.sa_engine,
            metrics_subsample=args.metrics_subsample,
        )
        def on_iteration_end(i, _state, metrics):
            writer.scalars(metrics, i + 1)

        find_ground_state(op, psi, state, config,
                          on_iteration_end=on_iteration_end)

    info = compute_metrics_on_full_space(
        op.basis, psi, state, subsample=args.metrics_subsample
    )
    logger.info("Final accuracy: {}; overlap: {}", info["accuracy"], info["overlap"])
    writer.close()
    print(f"{info['accuracy']},{info['overlap']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
