"""Exact-diagonalisation runner — the SpinED replacement.

``python -m annealing_sign_problem_tpu.experiments.ed_runner --yaml sys.yaml``
diagonalises the YAML system with the mesh-shardable Lanczos engine and
writes the ground state in the reference's HDF5 schema (the reference
invoked an external Haskell binary for this step: Makefile:157-166,
README.md:53-59).
"""

from __future__ import annotations

import argparse
import sys
import time

from .. import ed
from ..io import basis_from_config, load_yaml_config, operator_from_config, save_ground_state
from ..utils.log import logger
from .common import add_system_arguments, load_system


def main(argv=None):
    parser = argparse.ArgumentParser(description="Diagonalise a YAML spin system.")
    add_system_arguments(parser)
    parser.add_argument("--output", type=str, help="output .h5 (default: yaml name)")
    parser.add_argument("--num-iter", type=int, default=128)
    parser.add_argument("--restarts", type=int, default=4)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    op, name = load_system(args)
    output = args.output or (f"{name}.h5" if not args.yaml else args.yaml.replace(".yaml", ".h5"))

    op.basis.build()
    logger.info("Hilbert space dimension: {}", op.basis.number_states)
    t0 = time.time()
    energy, psi = ed.ground_state(
        op, num_iter=args.num_iter, restarts=args.restarts, seed=args.seed
    )
    logger.info("Ground state energy: {} ({:.1f}s)", energy, time.time() - t0)
    save_ground_state(output, psi, energy, op.basis.states)
    logger.info("Wrote {}", output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
