"""Gen-1 square-lattice self-training experiments.

The reference's square_4x4 / square_deep / square_deep4 drivers
(SURVEY §2.1): a self-contained SA <-> CNN loop on the J1-J2 square
lattice, logging per-iteration variational energy and sign overlap to
``energy.txt``/``overlap.txt`` and dumping SA energy traces to
``best.out``/``current.out`` (square_deep.py:185-186,240-251). Built on
the shared find_ground_state machinery with the periodic ConvSignModel
(the reference kept three near-identical copies of this loop; here depth
is a flag).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..amplitudes import ground_state_to_log_coeff_fn
from ..ising import make_ising_model
from ..models import ConvSignModel, DenseSignModel
from ..solvers import anneal
from ..train import (
    TrainingConfig,
    find_ground_state,
    init_sign_model,
    make_optimizer,
)
from ..train.mcmc import local_energy
from ..utils.log import logger
from ..utils.metrics_writer import MetricsWriter
from .common import add_system_arguments, load_system, resolve_ground_state


def parse_command_line(argv=None):
    parser = argparse.ArgumentParser(
        description="SA <-> CNN self-training on the J1-J2 square lattice."
    )
    add_system_arguments(parser)
    parser.add_argument("--output", type=str, default="square_run")
    parser.add_argument("--model", choices=["conv2", "conv3", "dense"], default="conv2",
                        help="conv2 = square_4x4's 2-layer CNN, conv3 = square_deep's 3-layer")
    parser.add_argument("--channels", type=int, default=32)
    parser.add_argument("--number-outer-iterations", type=int, default=4)
    parser.add_argument("--number-sa-sweeps", type=int, default=2000)
    parser.add_argument("--number-supervised-epochs", type=int, default=100)
    parser.add_argument("--number-monte-carlo-samples", type=int, default=4000)
    parser.add_argument("--train-batch-size", type=int, default=256)
    parser.add_argument("--learning-rate", type=float, default=1e-3)
    parser.add_argument("--dump-traces", action="store_true",
                        help="write SA energy traces to best.out/current.out")
    parser.add_argument("--seed", type=int, default=12345)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_command_line(argv)
    op, name = load_system(args)
    psi, energy = resolve_ground_state(op, name, args.hdf5)
    psi = psi / np.linalg.norm(psi)
    n = op.basis.number_spins

    side = int(round(np.sqrt(n)))
    if args.model == "dense" or side * side != n:
        model = DenseSignModel(number_spins=n, features=(args.channels, args.channels),
                               use_batchnorm=False)
    else:
        depth = 3 if args.model == "conv3" else 2
        model = ConvSignModel(shape=(side, side), channels=(args.channels,) * depth)

    state = init_sign_model(
        model, op.basis.states[:8], make_optimizer("adam", args.learning_rate),
        seed=args.seed,
    )

    os.makedirs(args.output, exist_ok=True)
    writer = MetricsWriter(args.output)

    if args.dump_traces:
        # SA energy traces on the full-basis model (square_deep.py:181-186)
        log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
        ising = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
        res = anneal(
            ising.ising_hamiltonian,
            seed=args.seed,
            number_sweeps=args.number_sa_sweeps,
            repetitions=1,
            only_best=False,
            track_trace=True,
        )
        np.savetxt(os.path.join(args.output, "current.out"), res.trace_current[:, 0])
        np.savetxt(os.path.join(args.output, "best.out"), res.trace_best[:, 0])

    import jax.numpy as jnp

    states_dev = op.basis.states_device
    log_abs = jnp.asarray(np.log(np.abs(psi)))

    def on_iteration_end(i, st, metrics):
        # variational energy of (exact amplitudes x learned signs) —
        # the energy.txt/overlap.txt logging of square_deep.py:240-251
        from ..train.supervised import forward_logits

        logits = forward_logits(st, op.basis.states)
        phases = jnp.asarray(np.pi * np.argmax(logits, axis=1))

        def log_psi_fn(spins):
            idx = jnp.clip(jnp.searchsorted(states_dev, spins), 0, len(psi) - 1)
            return log_abs[idx] + 1j * phases[idx]

        weights = psi**2
        e_loc = np.asarray(local_energy(op, log_psi_fn, states_dev)).real
        e_var = float(np.dot(weights, e_loc))
        writer.scalar("energy", e_var, i)
        writer.scalar("overlap", metrics["overlap"], i)
        writer.scalar("accuracy", metrics["accuracy"], i)
        with open(os.path.join(args.output, "energy.txt"), "a") as f:
            f.write(f"{i},{e_var},{energy}\n")
        with open(os.path.join(args.output, "overlap.txt"), "a") as f:
            f.write(f"{i},{metrics['overlap']}\n")
        logger.info("iteration {}: E_var = {} (exact {})", i, e_var, energy)

    config = TrainingConfig(
        number_sa_sweeps=args.number_sa_sweeps,
        number_supervised_epochs=args.number_supervised_epochs,
        number_monte_carlo_samples=args.number_monte_carlo_samples,
        number_outer_iterations=args.number_outer_iterations,
        train_batch_size=args.train_batch_size,
        output=args.output,
        seed=args.seed,
    )
    find_ground_state(op, psi, state, config, on_iteration_end=on_iteration_end)
    writer.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
