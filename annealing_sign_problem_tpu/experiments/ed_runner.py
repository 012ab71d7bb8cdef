"""Exact-diagonalisation runner — the SpinED replacement.

``python -m annealing_sign_problem_tpu.experiments.ed_runner --yaml sys.yaml``
diagonalises the YAML system and writes the ground state in the
reference's HDF5 schema (the reference invoked an external Haskell binary
for this step: Makefile:157-166, README.md:53-59).

Methods:
- ``auto``     — small sectors use the in-memory Lanczos; large symmetric
  sectors enumerate representatives on device and pick codebook/streaming
- ``small``    — in-memory ELL Lanczos (ed.ground_state)
- ``large``    — streaming/cached-table Lanczos (scale.ground_state_large)
- ``codebook`` — packed index+codebook table (single chip, kagome-36 class)
- ``sharded``  — row-sharded table over all visible devices
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from .. import ed, scale
from ..io import save_ground_state
from ..utils.log import logger
from .common import add_system_arguments, default_cache_dir, load_system


def main(argv=None):
    parser = argparse.ArgumentParser(description="Diagonalise a YAML spin system.")
    add_system_arguments(parser)
    parser.add_argument("--output", type=str, help="output .h5 (default: yaml name)")
    parser.add_argument(
        "--method",
        choices=["auto", "small", "large", "codebook", "sharded", "sector"],
        default="auto",
    )
    parser.add_argument("--num-iter", type=int, default=128)
    parser.add_argument("--restarts", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--block-cache-dir", type=str,
                        help="resumable table-block cache (codebook method)")
    args = parser.parse_args(argv)

    op, name = load_system(args)
    output = args.output or (
        f"{name}.h5" if not args.yaml else args.yaml.replace(".yaml", ".h5")
    )

    from scipy.special import comb

    sector = comb(op.basis.number_spins, op.basis.hamming_weight or 0, exact=True)
    method = args.method
    if method == "auto":
        if op.basis.has_symmetries and sector > (1 << 24):
            method = "large"
        else:
            method = "small"

    t0 = time.time()
    if method == "sector":
        # table-free full-hamming-sector ED (sk_32_1 class, sector.py):
        # no representative enumeration, combinadic indexing throughout
        import numpy as np

        from ..sector import ground_state_sector, make_sector_codec

        n, k = op.basis.number_spins, op.basis.hamming_weight
        logger.info("Hilbert space dimension: {} (full sector)", sector)
        energy, psi = ground_state_sector(
            op, num_iter=min(args.num_iter, 16), restarts=args.restarts,
            seed=args.seed,
            checkpoint_path=(args.block_cache_dir or ".") + f"/{name}_sector_ckpt.npz",
        )
        _, unrank = make_sector_codec(n, k)
        states = np.empty(sector, dtype=np.uint64)
        step = 1 << 24
        for s in range(0, sector, step):
            idx = np.arange(s, min(s + step, sector), dtype=np.int32)
            states[s : s + len(idx)] = np.asarray(unrank(idx))
        logger.info("Ground state energy: {} ({:.1f}s)", energy, time.time() - t0)
        save_ground_state(output, psi, energy, states)
        logger.info("Wrote {}", output)
        return 0
    if method == "small":
        op.basis.build()
        logger.info("Hilbert space dimension: {}", op.basis.number_states)
        energy, psi = ed.ground_state(
            op, num_iter=args.num_iter, restarts=args.restarts, seed=args.seed
        )
    else:
        rep_cache = os.path.join(default_cache_dir(), f"{name}_basis.npz")
        scale.build_basis_at_scale(op.basis, cache_path=rep_cache, hi_batch=16)
        logger.info("Hilbert space dimension: {}", op.basis.number_states)
        if method == "large":
            energy, psi = scale.ground_state_large(
                op, num_iter=min(args.num_iter, 64), restarts=args.restarts,
                seed=args.seed,
            )
        elif method == "codebook":
            energy, psi = scale.ground_state_codebook(
                op, num_iter=min(args.num_iter, 32), restarts=args.restarts,
                seed=args.seed, block_cache_dir=args.block_cache_dir,
            )
        else:  # sharded
            from ..parallel import make_mesh

            energy, psi = scale.ground_state_sharded(
                op, make_mesh(), num_iter=min(args.num_iter, 64),
                restarts=args.restarts, seed=args.seed,
            )
    logger.info("Ground state energy: {} ({:.1f}s)", energy, time.time() - t0)
    save_ground_state(output, psi, energy, op.basis.states)
    logger.info("Wrote {}", output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
