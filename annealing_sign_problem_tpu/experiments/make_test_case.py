"""Golden-fixture generator (the reference's test_cases.py:10-31).

Dumps the exact full-basis Ising model of a named system — COO/CSR matrix,
field, quantum energy, packed ground-state signs — to HDF5 so solver
implementations (this framework's or the reference's) can be validated
against identical data.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..amplitudes import ground_state_to_log_coeff_fn
from ..ising import dump_ising_model_to_hdf5, make_ising_model
from ..utils.log import logger
from .common import add_system_arguments, load_system, resolve_ground_state


def make_test_case(op, psi, filename: str) -> None:
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    dump_ising_model_to_hdf5(model, psi, filename)
    logger.info("Wrote golden fixture {}", filename)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Dump a golden Ising-model fixture.")
    add_system_arguments(parser)
    parser.add_argument("--output", type=str, required=True)
    args = parser.parse_args(argv)
    op, name = load_system(args)
    psi, _ = resolve_ground_state(op, name, args.hdf5)
    make_test_case(op, psi / np.linalg.norm(psi), args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
