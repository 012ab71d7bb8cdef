"""Built-in physical systems (self-contained system specs).

Each function returns a config dict in the YAML schema of
:mod:`annealing_sign_problem_tpu.io` so the framework can run every
reference benchmark with zero external data. Bond tables and symmetry
permutations are physics data taken from the reference system
specifications (cited per system); the Sherrington-Kirkpatrick instances
reproduce the reference's exact RNG stream (generate_sk.py:4,38-41, seed
167453) so the coupling matrices are bit-identical.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

__all__ = [
    "heisenberg_matrix",
    "j1j2_square",
    "heisenberg_kagome_16",
    "heisenberg_kagome_18",
    "heisenberg_kagome_36",
    "heisenberg_pyrochlore_2x2x2",
    "sk_instances",
    "get_system",
    "SMALL_SYSTEMS",
]


def heisenberg_matrix(j: float = 1.0) -> List[List[float]]:
    """Two-site Heisenberg bond in the |b_i b_j> basis: sz.sz + 2(s+s- + s-s+)
    in Pauli units (j1j2_square_4x4.yaml:14-17)."""
    return [
        [j, 0.0, 0.0, 0.0],
        [0.0, -j, 2.0 * j, 0.0],
        [0.0, 2.0 * j, -j, 0.0],
        [0.0, 0.0, 0.0, j],
    ]


def j1j2_square(L1: int = 4, L2: int = 4, j2: float = 0.55) -> Dict:
    """J1-J2 Heisenberg model on an L1 x L2 periodic square lattice.

    Derived algorithmically; for (4, 4, 0.55) the bond multiset equals the
    reference spec (j1j2_square_4x4.yaml:11-41).
    """
    def site(r, c):
        return (r % L1) * L2 + (c % L2)

    j1_bonds, j2_bonds = [], []
    for r in range(L1):
        for c in range(L2):
            s = site(r, c)
            j1_bonds += [[s, site(r, c + 1)], [s, site(r + 1, c)]]
            j2_bonds += [[s, site(r + 1, c + 1)], [s, site(r - 1, c + 1)]]
    n = L1 * L2
    return {
        "basis": {
            "number_spins": n,
            "hamming_weight": n // 2,
            "spin_inversion": None,
            "symmetries": [],
        },
        "hamiltonian": {
            "name": "J1-J2 Heisenberg",
            "terms": [
                {"matrix": heisenberg_matrix(1.0), "sites": j1_bonds},
                {"matrix": heisenberg_matrix(j2), "sites": j2_bonds},
            ],
        },
    }


# 16-site kagome cluster bond table (heisenberg_kagome_16.yaml:12).
_KAGOME_16_BONDS = [
    [0, 3], [0, 4], [1, 5], [1, 6], [2, 3], [2, 8], [3, 4], [3, 8], [4, 5],
    [4, 9], [5, 6], [5, 9], [6, 7], [6, 10], [7, 10], [8, 11], [8, 12],
    [9, 13], [9, 14], [10, 15], [11, 12], [12, 13], [13, 14], [14, 15],
]

# 18-site kagome torus bond table (heisenberg_kagome_18.yaml:12).
_KAGOME_18_BONDS = [
    [0, 2], [0, 3], [1, 4], [1, 5], [2, 6], [3, 7], [4, 7], [8, 12], [9, 13],
    [10, 13], [12, 14], [12, 15], [13, 16], [13, 17], [2, 3], [3, 4], [4, 5],
    [8, 9], [9, 10], [10, 11], [14, 15], [15, 16], [16, 17], [6, 8], [6, 9],
    [7, 10], [7, 11], [5, 6], [11, 12], [2, 5], [8, 11], [14, 17], [0, 17],
    [0, 14], [1, 15], [1, 16],
]

# 36-site kagome torus: bonds (heisenberg_kagome_36.yaml:42) and the six
# symmetry generators (heisenberg_kagome_36.yaml:12-30), all in sector 0.
_KAGOME_36_BONDS = [
    [0, 1], [0, 2], [0, 31], [0, 32], [1, 2], [1, 6], [1, 26], [2, 3], [2, 7],
    [3, 4], [3, 7], [3, 35], [4, 5], [4, 8], [4, 35], [5, 8], [5, 16], [5, 20],
    [6, 10], [6, 11], [6, 26], [7, 12], [7, 13], [8, 14], [8, 15], [9, 10],
    [9, 16], [9, 29], [9, 34], [10, 11], [10, 16], [11, 12], [11, 17],
    [12, 13], [12, 17], [13, 14], [13, 18], [14, 15], [14, 18], [15, 19],
    [15, 30], [16, 20], [17, 21], [17, 22], [18, 23], [18, 24], [19, 25],
    [19, 26], [19, 30], [20, 21], [20, 27], [21, 22], [21, 27], [22, 23],
    [22, 28], [23, 24], [23, 28], [24, 25], [24, 29], [25, 26], [25, 29],
    [27, 30], [27, 31], [28, 32], [28, 33], [29, 34], [30, 31], [31, 32],
    [32, 33], [33, 34], [33, 35], [34, 35],
]

_KAGOME_36_SYMMETRIES = [
    # translation along x
    [7, 12, 13, 14, 15, 30, 17, 18, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28,
     29, 6, 31, 32, 33, 34, 9, 10, 11, 0, 35, 16, 1, 2, 3, 4, 5, 8],
    # translation along y
    [6, 10, 11, 12, 13, 14, 16, 17, 18, 4, 5, 20, 21, 22, 23, 24, 8, 27, 28,
     29, 15, 30, 31, 32, 33, 34, 9, 19, 0, 35, 25, 26, 1, 2, 3, 7],
    # 60-degree rotation
    [5, 4, 8, 15, 19, 26, 3, 14, 25, 0, 2, 7, 13, 18, 24, 29, 1, 12, 23, 34,
     6, 11, 17, 22, 28, 33, 35, 10, 21, 32, 9, 16, 20, 27, 31, 30],
    # corner-axed mirror reflections
    [0, 31, 32, 33, 34, 9, 27, 28, 29, 5, 20, 21, 22, 23, 24, 25, 16, 17, 18,
     19, 10, 11, 12, 13, 14, 15, 30, 6, 7, 8, 26, 1, 2, 3, 4, 35],
    [26, 1, 6, 10, 16, 5, 2, 11, 20, 35, 3, 7, 12, 17, 21, 27, 4, 13, 22, 31,
     8, 14, 18, 23, 28, 32, 0, 15, 24, 33, 30, 19, 25, 29, 34, 9],
    [30, 19, 15, 8, 4, 35, 25, 14, 3, 9, 29, 24, 18, 13, 7, 2, 34, 23, 12, 1,
     33, 28, 22, 17, 11, 6, 26, 32, 21, 10, 0, 31, 27, 20, 16, 5],
]

# 32-site pyrochlore 2x2x2 cell: nearest-neighbour bonds and symmetry
# generators (heisenberg_pyrochlore_2x2x2.yaml:5-36).
_PYROCHLORE_32_BONDS = [
    [0, 8], [0, 12], [0, 16], [0, 18], [0, 24], [0, 25], [1, 9], [1, 13],
    [1, 17], [1, 19], [1, 24], [1, 25], [2, 10], [2, 14], [2, 16], [2, 18],
    [2, 26], [2, 27], [3, 11], [3, 15], [3, 17], [3, 19], [3, 26], [3, 27],
    [4, 8], [4, 12], [4, 20], [4, 22], [4, 28], [4, 29], [5, 9], [5, 13],
    [5, 21], [5, 23], [5, 28], [5, 29], [6, 10], [6, 14], [6, 20], [6, 22],
    [6, 30], [6, 31], [7, 11], [7, 15], [7, 21], [7, 23], [7, 30], [7, 31],
    [8, 16], [8, 22], [8, 24], [8, 29], [9, 17], [9, 23], [9, 25], [9, 28],
    [10, 18], [10, 20], [10, 26], [10, 31], [11, 19], [11, 21], [11, 27],
    [11, 30], [12, 18], [12, 20], [12, 25], [12, 28], [13, 19], [13, 21],
    [13, 24], [13, 29], [14, 16], [14, 22], [14, 27], [14, 30], [15, 17],
    [15, 23], [15, 26], [15, 31], [16, 24], [16, 27], [17, 25], [17, 26],
    [18, 25], [18, 26], [19, 24], [19, 27], [20, 28], [20, 31], [21, 29],
    [21, 30], [22, 29], [22, 30], [23, 28], [23, 31],
]

_PYROCHLORE_32_SYMMETRIES = [
    [24, 25, 27, 26, 29, 28, 30, 31, 8, 9, 11, 10, 13, 12, 14, 15, 16, 17,
     19, 18, 21, 20, 22, 23, 0, 1, 3, 2, 5, 4, 6, 7],
    [0, 2, 4, 6, 1, 3, 5, 7, 24, 26, 28, 30, 25, 27, 29, 31, 8, 10, 12, 14,
     9, 11, 13, 15, 16, 18, 20, 22, 17, 19, 21, 23],
    [0, 1, 2, 3, 4, 5, 6, 7, 12, 13, 14, 15, 8, 9, 10, 11, 18, 19, 16, 17,
     22, 23, 20, 21, 25, 24, 27, 26, 29, 28, 31, 30],
    [4, 5, 6, 7, 0, 1, 2, 3, 12, 13, 14, 15, 8, 9, 10, 11, 20, 21, 22, 23,
     16, 17, 18, 19, 28, 29, 30, 31, 24, 25, 26, 27],
    [2, 3, 0, 1, 6, 7, 4, 5, 10, 11, 8, 9, 14, 15, 12, 13, 18, 19, 16, 17,
     22, 23, 20, 21, 26, 27, 24, 25, 30, 31, 28, 29],
    [1, 0, 3, 2, 5, 4, 7, 6, 9, 8, 11, 10, 13, 12, 15, 14, 17, 16, 19, 18,
     21, 20, 23, 22, 25, 24, 27, 26, 29, 28, 31, 30],
]


def _bond_system(
    name: str,
    number_spins: int,
    bonds: List[List[int]],
    spin_inversion: Optional[int] = None,
    symmetries: Optional[List[List[int]]] = None,
) -> Dict:
    return {
        "basis": {
            "number_spins": number_spins,
            "hamming_weight": number_spins // 2,
            "spin_inversion": spin_inversion,
            "symmetries": [
                {"permutation": p, "sector": 0} for p in (symmetries or [])
            ],
        },
        "hamiltonian": {
            "name": name,
            "terms": [{"matrix": heisenberg_matrix(1.0), "sites": bonds}],
        },
    }


def heisenberg_kagome_16() -> Dict:
    return _bond_system("kagome-16", 16, _KAGOME_16_BONDS)


def heisenberg_kagome_18() -> Dict:
    return _bond_system("kagome-18", 18, _KAGOME_18_BONDS, spin_inversion=1)


def heisenberg_kagome_36() -> Dict:
    return _bond_system(
        "kagome-36", 36, _KAGOME_36_BONDS, spin_inversion=1,
        symmetries=_KAGOME_36_SYMMETRIES,
    )


def heisenberg_pyrochlore_2x2x2() -> Dict:
    return _bond_system(
        "pyrochlore-32", 32, _PYROCHLORE_32_BONDS, spin_inversion=1,
        symmetries=_PYROCHLORE_32_SYMMETRIES,
    )


def sk_instances() -> Dict[str, Dict]:
    """The four Sherrington-Kirkpatrick instances of the reference.

    Reproduces the exact legacy-RandomState stream of generate_sk.py
    (seed 167453, instances drawn in order 16_1, 16_2, 16_3, 32_1 —
    generate_sk.py:4,38-41) so couplings are bit-identical.
    """
    rng = np.random.RandomState(167453)
    base = np.array(heisenberg_matrix(1.0), dtype=np.float64)

    def instance(n: int) -> Dict:
        terms = []
        for i in range(n - 1):
            for j in range(i + 1, n):
                coupling = rng.normal(0.0, 1.0)
                terms.append(
                    {"matrix": (coupling * base).tolist(), "sites": [[i, j]]}
                )
        return {
            "basis": {
                "number_spins": n,
                "hamming_weight": n // 2,
                "spin_inversion": None,
                "symmetries": [],
            },
            "hamiltonian": {"name": "Sherrington-Kirkpatrick", "terms": terms},
        }

    return {
        "sk_16_1": instance(16),
        "sk_16_2": instance(16),
        "sk_16_3": instance(16),
        "sk_32_1": instance(32),
    }


def sherrington_kirkpatrick(n: int, seed: int, mu: float = 0.0, sigma: float = 1.0) -> Dict:
    """A fresh SK instance with N(mu, sigma) all-to-all Heisenberg couplings."""
    rng = np.random.RandomState(seed)
    base = np.array(heisenberg_matrix(1.0), dtype=np.float64)
    terms = []
    for i in range(n - 1):
        for j in range(i + 1, n):
            terms.append(
                {"matrix": (rng.normal(mu, sigma) * base).tolist(), "sites": [[i, j]]}
            )
    return {
        "basis": {
            "number_spins": n,
            "hamming_weight": n // 2,
            "spin_inversion": None,
            "symmetries": [],
        },
        "hamiltonian": {"name": "Sherrington-Kirkpatrick", "terms": terms},
    }


SMALL_SYSTEMS = (
    "heisenberg_kagome_16",
    "heisenberg_kagome_18",
    "j1j2_square_4x4",
    "sk_16_1",
    "sk_16_2",
    "sk_16_3",
)


def get_system(name: str) -> Dict:
    """Look up any built-in system by its reference name."""
    if name == "j1j2_square_4x4":
        return j1j2_square(4, 4, 0.55)
    if name == "heisenberg_kagome_16":
        return heisenberg_kagome_16()
    if name == "heisenberg_kagome_18":
        return heisenberg_kagome_18()
    if name == "heisenberg_kagome_36":
        return heisenberg_kagome_36()
    if name == "heisenberg_pyrochlore_2x2x2":
        return heisenberg_pyrochlore_2x2x2()
    if name.startswith("sk_"):
        instances = sk_instances()
        if name in instances:
            return instances[name]
    raise KeyError(f"unknown system: {name!r}")
