"""YAML system specs and HDF5 ground-state files.

The YAML schema is kept verbatim-compatible with the reference's
physical_systems/*.yaml files (basis: number_spins / hamming_weight /
spin_inversion / symmetries; hamiltonian: terms = 4x4 matrices x site
lists — j1j2_square_4x4.yaml:1-45, heisenberg_kagome_36.yaml:7-31) so that
the reference's data files can be consumed directly.

The HDF5 ground-state schema matches the reference ED output
(common.py:772-780): /hamiltonian/eigenvectors, /hamiltonian/eigenvalues,
/basis/representatives.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import yaml

from .basis import SpinBasis, Symmetry
from .operator import Operator, TermGroup

__all__ = [
    "load_yaml_config",
    "basis_from_config",
    "operator_from_config",
    "load_hamiltonian",
    "load_ground_state",
    "save_ground_state",
    "load_input_files",
    "config_to_yaml",
]


def load_yaml_config(filename: str) -> dict:
    with open(filename, "r") as f:
        return yaml.load(f, Loader=yaml.SafeLoader)


def basis_from_config(config: dict) -> SpinBasis:
    """Build a :class:`SpinBasis` from the ``basis:`` section."""
    b = config["basis"] if "basis" in config else config
    symmetries = [
        Symmetry(tuple(s["permutation"]), int(s["sector"]))
        for s in (b.get("symmetries") or [])
    ]
    return SpinBasis(
        number_spins=int(b["number_spins"]),
        hamming_weight=b.get("hamming_weight"),
        spin_inversion=b.get("spin_inversion"),
        symmetries=symmetries,
    )


def operator_from_config(config: dict, basis: SpinBasis) -> Operator:
    """Build an :class:`Operator` from the ``hamiltonian:`` section."""
    h = config["hamiltonian"] if "hamiltonian" in config else config
    terms = [
        TermGroup(np.asarray(t["matrix"], dtype=np.float64), np.asarray(t["sites"]))
        for t in h["terms"]
    ]
    return Operator(basis, terms)


def load_hamiltonian(filename: str) -> Operator:
    """YAML file -> Operator (with its basis). Mirrors common.py:783-788."""
    config = load_yaml_config(filename)
    basis = basis_from_config(config)
    return operator_from_config(config, basis)


def load_ground_state(filename: str) -> Tuple[np.ndarray, float, np.ndarray]:
    """Read (ground_state, energy, representatives) from an ED output file.

    Schema-compatible with the reference reader (common.py:772-780).
    """
    import h5py

    with h5py.File(filename, "r") as f:
        ground_state = np.asarray(f["/hamiltonian/eigenvectors"], dtype=np.float64)
        ground_state = ground_state.squeeze()
        if ground_state.ndim > 1:
            ground_state = ground_state[0, :]
        energy = float(np.asarray(f["/hamiltonian/eigenvalues"]).reshape(-1)[0])
        representatives = np.asarray(f["/basis/representatives"], dtype=np.uint64)
    return ground_state, energy, representatives


def save_ground_state(
    filename: str,
    ground_state: np.ndarray,
    energy: float,
    representatives: np.ndarray,
) -> None:
    """Write an ED result in the reference's file schema so either framework
    can consume it."""
    import h5py

    with h5py.File(filename, "w") as f:
        f["/hamiltonian/eigenvectors"] = np.asarray(ground_state, dtype=np.float64).reshape(
            1, -1
        )
        f["/hamiltonian/eigenvalues"] = np.asarray([energy], dtype=np.float64)
        f["/basis/representatives"] = np.asarray(representatives, dtype=np.uint64)


def load_input_files(yaml_filename: str, hdf5_filename: Optional[str] = None):
    """Load the Hamiltonian and its ED ground state; build the basis from
    the stored representatives. Mirrors common.py:791-803."""
    if hdf5_filename is None:
        hdf5_filename = yaml_filename.replace(".yaml", ".h5")
    hamiltonian = load_hamiltonian(yaml_filename)
    ground_state, energy, representatives = load_ground_state(hdf5_filename)
    hamiltonian.basis.build(representatives)
    return hamiltonian, ground_state, energy


def config_to_yaml(config: dict, filename: str) -> None:
    with open(filename, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
