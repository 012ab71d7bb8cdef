"""Shared experiment plumbing: system resolution and ED caching.

The reference pipeline needs externally produced `.h5` ED files
(README.md:62-90); this framework recomputes them on demand with the
built-in Lanczos engine and caches in the reference's file schema, so any
experiment runs from a bare checkout. Externally supplied files (including
the reference's own data-small/data-large archives) are consumed directly
when present.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional, Tuple

import numpy as np

from .. import ed, systems
from ..io import (
    basis_from_config,
    load_ground_state,
    load_yaml_config,
    operator_from_config,
    save_ground_state,
)
from ..operator import Operator
from ..utils.log import logger

__all__ = ["add_system_arguments", "load_system", "resolve_ground_state"]

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def default_cache_dir() -> str:
    return os.environ.get(
        "ASP_TPU_CACHE_DIR",
        os.path.join(_REPO_ROOT, "physical_systems", "data-small"),
    )


def add_system_arguments(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--system", type=str, help="built-in system name")
    parser.add_argument("--yaml", type=str, help="YAML system spec file")
    parser.add_argument("--hdf5", type=str, help="ED ground-state file")


def load_system(args) -> Tuple[Operator, str]:
    """Operator (+ its name) from --system or --yaml."""
    if getattr(args, "yaml", None):
        config = load_yaml_config(args.yaml)
        name = os.path.splitext(os.path.basename(args.yaml))[0]
    elif getattr(args, "system", None):
        try:
            config = systems.get_system(args.system)
        except KeyError:
            raise SystemExit(
                f"unknown system: {args.system!r}; built-ins: "
                + ", ".join(sorted(["j1j2_square_4x4", *systems.SMALL_SYSTEMS,
                                    "heisenberg_kagome_36",
                                    "heisenberg_pyrochlore_2x2x2", "sk_32_1"]))
            )
        name = args.system
    else:
        raise SystemExit("specify either --system or --yaml")
    basis = basis_from_config(config)
    return operator_from_config(config, basis), name


def resolve_ground_state(
    op: Operator,
    name: str,
    hdf5: Optional[str] = None,
    cache_dir: Optional[str] = None,
    num_iter: int = 128,
) -> Tuple[np.ndarray, float]:
    """Ground state from file if given/cached, else recomputed and cached.

    Builds the basis from the stored representatives when loading
    (common.py:791-803) or from enumeration when computing.
    """
    if hdf5 is None:
        cache_dir = cache_dir or default_cache_dir()
        candidate = os.path.join(cache_dir, f"{name}.h5")
        hdf5 = candidate if os.path.exists(candidate) else None
        cache_to = candidate
    else:
        cache_to = None

    if hdf5 is not None:
        psi, energy, representatives = load_ground_state(hdf5)
        rep_cache = os.path.join(
            cache_dir or default_cache_dir(), f"{name}_basis.npz"
        )
        if op.basis.has_symmetries and os.path.exists(rep_cache):
            # the cached enumeration carries the stabiliser norms too —
            # recomputing them lazily for a 31.5M-representative basis
            # would grind through the host orbit path
            from .. import scale

            scale.build_basis_at_scale(op.basis, cache_path=rep_cache)
            if op.basis.number_states != len(representatives):
                raise RuntimeError(
                    f"basis cache ({op.basis.number_states}) disagrees with "
                    f"the h5 representatives ({len(representatives)})"
                )
        else:
            op.basis.build(representatives)
        logger.info("Ground state energy is {}", energy)
        return psi, energy

    t0 = time.time()
    # large symmetric sectors (pyrochlore-32, kagome-36) take the
    # TPU-native enumeration + streaming-Lanczos path
    from scipy.special import comb

    sector = comb(op.basis.number_spins, op.basis.hamming_weight or 0, exact=True)
    if op.basis.has_symmetries and sector > (1 << 24):
        from .. import scale

        rep_cache = os.path.join(cache_dir or default_cache_dir(), f"{name}_basis.npz")
        scale.build_basis_at_scale(op.basis, cache_path=rep_cache, hi_batch=16)
        energy, psi = scale.ground_state_large(op, num_iter=num_iter // 2 or 32)
    else:
        op.basis.build()
        energy, psi = ed.ground_state(op, num_iter=num_iter, restarts=8, seed=0)
        # Ritz-misconvergence guard: a restarted Lanczos can converge
        # cleanly onto an excited state (it happened for kagome-18 — the
        # E=-32.059 vector had overlap 0.013 with the true -32.193 ground
        # state and silently poisoned every downstream sign metric). A
        # second, independently seeded run must agree.
        energy2, psi2 = ed.ground_state(op, num_iter=num_iter, restarts=8, seed=17)
        if abs(energy - energy2) > 1e-6 * max(1.0, abs(energy)):
            logger.warning(
                "ED seeds disagree ({} vs {}); keeping the lower", energy, energy2
            )
        if energy2 < energy:
            energy, psi = energy2, psi2
    logger.info(
        "Ground state energy is {} (diagonalised in {:.1f}s, dim {})",
        energy,
        time.time() - t0,
        op.basis.number_states,
    )
    if cache_to is not None:
        os.makedirs(os.path.dirname(cache_to), exist_ok=True)
        save_ground_state(cache_to, psi, energy, op.basis.states)
    return psi, energy
