"""Spin basis: Hilbert-space sectors, symmetry reduction, state indexing.

TPU-native replacement for the surface of ``lattice_symmetries.SpinBasis``
used by the reference (SURVEY §2.3; call sites common.py:29,37-38,86,96,
759,786-787,801,817). States are uint64 words (bit i = site i); the basis
keeps a sorted array of (representative) states so that ``index`` is a
vectorised ``searchsorted`` instead of a C++ hash lookup.

Supported sector structure (matching the YAML schema of
physical_systems/*.yaml in the reference):

- ``number_spins`` (n <= 64)
- ``hamming_weight`` — fixed-magnetisation sector, or None for all 2^n
- ``spin_inversion`` — +1/-1 eigenvalue of the global spin flip, or None
- ``symmetries`` — list of (permutation, sector) generators; the full group
  is built by closure and characters are exp(-2πi·sector/period) products.

For large symmetry-adapted bases (kagome-36), representatives are not
enumerated from scratch; they are supplied via :meth:`SpinBasis.build`
exactly like the reference does with ED output files (common.py:801).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bits as _bits

__all__ = ["SpinBasis", "Symmetry", "enumerate_fixed_hamming"]


def enumerate_fixed_hamming(n: int, k: int) -> np.ndarray:
    """All n-bit words with exactly k set bits, ascending.

    Vectorised divide-and-conquer instead of a sequential Gosper loop:
    states(n, k) = states(n-1, k) ++ (states(n-1, k-1) | 1 << (n-1)),
    which is naturally sorted. O(C(n, k)) memory, no Python-level loop
    over states.
    """
    if k < 0 or k > n:
        return np.zeros(0, dtype=np.uint64)

    @functools.lru_cache(maxsize=None)
    def rec(m: int, j: int) -> np.ndarray:
        if j == 0:
            return np.zeros(1, dtype=np.uint64)
        if m == j:
            return np.array([(np.uint64(1) << np.uint64(m)) - np.uint64(1)], dtype=np.uint64)
        lo = rec(m - 1, j)
        hi = rec(m - 1, j - 1) | (np.uint64(1) << np.uint64(m - 1))
        return np.concatenate([lo, hi])

    out = rec(n, k)
    rec.cache_clear()
    return out


@dataclass(frozen=True)
class Symmetry:
    """A symmetry-group generator: a site permutation plus its sector.

    The eigenvalue of the generator on the chosen irrep is
    ``exp(-2πi * sector / periodicity)`` (lattice_symmetries convention;
    all reference systems use sector 0, i.e. character +1 —
    heisenberg_kagome_36.yaml:12-30).
    """

    permutation: Tuple[int, ...]
    sector: int

    @property
    def periodicity(self) -> int:
        p = np.asarray(self.permutation)
        idx = np.arange(len(p))
        cur = p.copy()
        order = 1
        while not np.array_equal(cur, idx):
            cur = p[cur]
            order += 1
        return order

    @property
    def character(self) -> complex:
        return np.exp(-2j * np.pi * self.sector / self.periodicity)


def _close_group(generators: Sequence[Symmetry], n: int):
    """BFS closure of the permutation group; returns (perms (G, n) int32,
    characters (G,) complex)."""
    identity = tuple(range(n))
    elements = {identity: 1.0 + 0j}
    frontier = [(identity, 1.0 + 0j)]
    gens = [(tuple(g.permutation), g.character) for g in generators]
    while frontier:
        new_frontier = []
        for perm, chi in frontier:
            for gperm, gchi in gens:
                # composition: (g ∘ p)[i] = gperm[perm[i]]
                comp = tuple(gperm[p] for p in perm)
                c = chi * gchi
                if comp not in elements:
                    elements[comp] = c
                    new_frontier.append((comp, c))
                elif not np.isclose(elements[comp], c):
                    raise ValueError(
                        "inconsistent characters: the chosen sectors are not "
                        "a valid one-dimensional irrep of the group"
                    )
        frontier = new_frontier
    perms = np.array(sorted(elements.keys()), dtype=np.int32)
    chars = np.array([elements[tuple(p)] for p in perms])
    return perms, chars


def _permute_bits_numpy(states: np.ndarray, perm: np.ndarray, n: int) -> np.ndarray:
    """Apply a site permutation to packed states: bit perm[i] of the output
    equals bit i of the input (site i moves to site perm[i])."""
    out = np.zeros_like(states)
    one = np.uint64(1)
    for i in range(n):
        bit = (states >> np.uint64(i)) & one
        out |= bit << np.uint64(perm[i])
    return out


class SpinBasis:
    """Sorted-representative spin basis with vectorised indexing."""

    def __init__(
        self,
        number_spins: int,
        hamming_weight: Optional[int] = None,
        spin_inversion: Optional[int] = None,
        symmetries: Sequence[Symmetry] = (),
    ):
        if number_spins > 64:
            raise ValueError("only systems with up to 64 spins are supported")
        if spin_inversion not in (None, 1, -1):
            raise ValueError("spin_inversion must be None, +1, or -1")
        if spin_inversion is not None and hamming_weight is not None:
            if 2 * hamming_weight != number_spins:
                raise ValueError("spin_inversion requires hamming_weight == n/2")
        self.number_spins = int(number_spins)
        self.hamming_weight = None if hamming_weight is None else int(hamming_weight)
        self.spin_inversion = spin_inversion
        self.symmetries = list(symmetries)
        if self.symmetries:
            self._perms, self._chars = _close_group(self.symmetries, number_spins)
        else:
            self._perms = np.arange(number_spins, dtype=np.int32).reshape(1, -1)
            self._chars = np.ones(1, dtype=np.complex128)
        if not np.allclose(self._chars.imag, 0.0, atol=1e-12):
            raise NotImplementedError(
                "complex characters are not supported yet (all reference "
                "systems use real sectors)"
            )
        self._chars = np.ascontiguousarray(self._chars.real)
        self._states: Optional[np.ndarray] = None
        self._norms: Optional[np.ndarray] = None
        self._states_device = None

    # -- group structure -----------------------------------------------------

    @property
    def has_symmetries(self) -> bool:
        return len(self.symmetries) > 0 or self.spin_inversion is not None

    @property
    def group_size(self) -> int:
        g = self._perms.shape[0]
        return 2 * g if self.spin_inversion is not None else g

    def _full_mask(self) -> np.uint64:
        n = self.number_spins
        if n == 64:
            return np.uint64(0xFFFFFFFFFFFFFFFF)
        return np.uint64((1 << n) - 1)

    def _inversion_character(self) -> float:
        """Character carried by one application of spin inversion.

        The inversion is the π spin rotation exp(iπS^y) = Π_j (iσ^y_j),
        whose action on a basis state is (-1)^{n_up} x bit-flip — at fixed
        hamming weight k a constant (-1)^k relative to the plain bit-flip.
        This matches the lattice_symmetries convention used by the
        reference data files (spin_inversion: 1 selects the sector that
        contains the singlet ground state for both even and odd n/2, e.g.
        heisenberg_kagome_18.yaml:4 with k = 9).
        """
        k = self.hamming_weight if self.hamming_weight is not None else 0
        return float(self.spin_inversion) * ((-1.0) ** k)

    def _orbit_images(self, states: np.ndarray):
        """All group images of each state: (G, N) uint64 plus characters (G,)."""
        n = self.number_spins
        imgs = np.stack(
            [_permute_bits_numpy(states, self._perms[g], n) for g in range(self._perms.shape[0])]
        )
        chars = self._chars
        if self.spin_inversion is not None:
            inv = imgs ^ self._full_mask()
            imgs = np.concatenate([imgs, inv], axis=0)
            chars = np.concatenate([chars, self._inversion_character() * chars])
        return imgs, chars

    # -- construction ----------------------------------------------------------

    def _enumerate_sector(self) -> np.ndarray:
        n = self.number_spins
        if self.hamming_weight is None:
            if n > 28:
                raise ValueError(f"refusing to enumerate 2^{n} states")
            return np.arange(1 << n, dtype=np.uint64)
        return enumerate_fixed_hamming(n, self.hamming_weight)

    def build(self, representatives: Optional[np.ndarray] = None) -> "SpinBasis":
        """Materialise the sorted representative list.

        ``representatives`` may come from an ED output file (the reference
        does exactly this — common.py:801); otherwise the sector is
        enumerated and reduced to representatives here.
        """
        if representatives is not None:
            states = np.sort(np.asarray(representatives, dtype=np.uint64))
            self._states = states
            self._norms = None  # computed lazily when needed
            self._states_device = None
            return self

        sector = self._enumerate_sector()
        if not self.has_symmetries:
            self._states = sector
            self._norms = None
            self._states_device = None
            return self

        imgs, chars = self._orbit_images(sector)
        rep = imgs.min(axis=0)
        is_rep = sector == rep
        # stabiliser sum: sum of characters over group elements fixing the state;
        # a representative survives iff the sum is nonzero (# of stabiliser
        # elements when it is compatible with the irrep).
        stab_sum = np.where(imgs == sector[None, :], chars[:, None], 0.0).sum(axis=0)
        keep = is_rep & (np.abs(stab_sum) > 1e-9)
        self._states = sector[keep]
        self._norms = stab_sum[keep].astype(np.float64)
        self._states_device = None
        return self

    def _require_states(self) -> np.ndarray:
        if self._states is None:
            self.build()
        return self._states

    @property
    def states(self) -> np.ndarray:
        return self._require_states()

    @property
    def number_states(self) -> int:
        return int(self._require_states().shape[0])

    @property
    def norms(self) -> np.ndarray:
        """Stabiliser sums n_r per representative (1.0 without symmetries)."""
        self._require_states()
        if self._norms is None:
            if self.has_symmetries and (self.symmetries or self.spin_inversion is not None):
                imgs, chars = self._orbit_images(self._states)
                self._norms = (
                    np.where(imgs == self._states[None, :], chars[:, None], 0.0)
                    .sum(axis=0)
                    .astype(np.float64)
                )
            else:
                self._norms = np.ones(self.number_states, dtype=np.float64)
        return self._norms

    @property
    def states_device(self) -> jax.Array:
        if self._states_device is None:
            self._states_device = jnp.asarray(self._require_states())
        return self._states_device

    # -- indexing ----------------------------------------------------------------

    def index(self, spins) -> np.ndarray:
        """Indices of (representative) states in the sorted basis. Host-side.

        Mirrors ``basis.index``/``basis.batched_index`` (common.py:37-38).
        """
        spins = _bits.spins_to_array(spins)
        states = self._require_states()
        idx = np.searchsorted(states, spins)
        idx = np.clip(idx, 0, states.shape[0] - 1)
        if not np.all(states[idx] == spins):
            raise KeyError("some spins are not part of the basis")
        return idx

    batched_index = index

    def index_device(self, spins: jax.Array) -> jax.Array:
        """Jittable index lookup; out-of-basis states map to a clipped slot
        (callers must mask with a membership check)."""
        states = self.states_device
        idx = jnp.searchsorted(states, spins)
        return jnp.clip(idx, 0, states.shape[0] - 1)

    # -- symmetry-representative mapping -----------------------------------------

    def state_info(self, spins) -> Tuple[np.ndarray, np.ndarray]:
        """Map arbitrary sector states to (representative, character).

        The character is that of (any) group element g with g·rep = state;
        it multiplies off-diagonal Hamiltonian matrix elements in the
        symmetry-adapted basis. Replaces ``basis.batched_state_info``
        (sampled_connected_components.py:353-354).
        """
        spins = _bits.spins_to_array(spins)
        if not self.has_symmetries:
            return spins, np.ones(spins.shape[0], dtype=np.float64)
        imgs, chars = self._orbit_images(spins)
        which = imgs.argmin(axis=0)
        rep = imgs.min(axis=0)
        # character of the element mapping the representative back to the state
        # (for real characters, chi(g^-1) = chi(g)).
        chi = chars[which]
        return rep, chi

    def _part_tables(self):
        """Bit-permutation matmul tables: the group image of a state is
        img_g = sum_i bit_i * 2^{perm_g(i)}, evaluated exactly in f32 by
        splitting the 2^{p} weights into <=16-bit parts — each partial sum
        stays below 2^16 * n < 2^24, so plain MXU matmuls compute exact
        integer images. Returns (parts (n_parts, n, G) f32, part_shifts)."""
        if getattr(self, "_part_table_cache", None) is not None:
            return self._part_table_cache
        n = self.number_spins
        perms = self._perms  # (G, n)
        n_parts = (n + 15) // 16
        tables = np.zeros((n_parts, n, perms.shape[0]), dtype=np.float32)
        for p in range(n_parts):
            lo, hi = 16 * p, min(16 * (p + 1), n)
            sel = (perms >= lo) & (perms < hi)
            weights = np.where(sel, 2.0 ** (perms - lo), 0.0)
            tables[p] = weights.T.astype(np.float32)
        shifts = np.arange(n_parts, dtype=np.uint64) * np.uint64(16)
        self._part_table_cache = (tables, shifts)
        return tables, shifts

    def _orbit_reduce_device(self, spins: jax.Array):
        """Orbit reduction with no 64-bit arithmetic in the hot path.

        Group images are computed as exact <=16-bit f32 parts via MXU
        matmuls; the orbit minimum is a lexicographic compare from the
        most significant part down, entirely in f32 (64-bit integer ops
        are emulated on TPU and dominate runtime otherwise). Returns
        (rep (uint64), chi of a minimising element, is_rep, stabiliser
        character sum).
        """
        n = self.number_spins
        tables, part_shifts = self._part_tables()
        n_parts = tables.shape[0]
        shifts = jnp.arange(n, dtype=jnp.uint64)
        bit = ((spins[..., None] >> shifts) & jnp.uint64(1)).astype(jnp.float32)

        chars = jnp.asarray(self._chars, dtype=jnp.float32)
        full_mask = self._full_mask()
        parts = []
        for p in range(n_parts):
            part = jnp.dot(
                bit, jnp.asarray(tables[p]), preferred_element_type=jnp.float32
            )  # (..., G), exact integers < 2^16 * 1 (single set bit per weight)
            if self.spin_inversion is not None:
                mask_p = jnp.float32((int(full_mask) >> (16 * p)) & 0xFFFF)
                part = jnp.concatenate([part, mask_p - part], axis=-1)
            parts.append(part)
        if self.spin_inversion is not None:
            chars = jnp.concatenate(
                [chars, jnp.float32(self._inversion_character()) * chars]
            )

        # lexicographic min over the group, most significant part first
        sel = jnp.ones(parts[0].shape, dtype=bool)
        rep = jnp.zeros(spins.shape, dtype=jnp.uint64)
        state_eq = jnp.ones(parts[0].shape, dtype=bool)
        for p in reversed(range(n_parts)):
            cur = jnp.where(sel, parts[p], jnp.inf)
            mp = jnp.min(cur, axis=-1)
            sel = sel & (parts[p] == mp[..., None])
            rep = rep | (mp.astype(jnp.uint64) << part_shifts[p])
            own = ((spins >> part_shifts[p]) & jnp.uint64(0xFFFF)).astype(jnp.float32)
            state_eq = state_eq & (parts[p] == own[..., None])

        # chi of a minimising element; ties prefer +1 (the perm part wins)
        chi = jnp.max(jnp.where(sel, chars, -jnp.inf), axis=-1)
        stab = jnp.sum(jnp.where(state_eq, chars, 0.0), axis=-1)
        is_rep = rep == spins
        return rep, chi.astype(jnp.float64), is_rep, stab.astype(jnp.float64)

    def state_info_device(self, spins: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Jittable version of :meth:`state_info` (matmul-based orbit
        minimisation; exact)."""
        if not self.has_symmetries:
            return spins, jnp.ones(spins.shape, dtype=jnp.float64)
        rep, chi, _, _ = self._orbit_reduce_device(spins)
        return rep, chi

    def orbit_info_device(self, spins: jax.Array):
        """(representative, is_representative, stabiliser character sum) for
        a batch — the device primitive behind large-scale representative
        enumeration (scale.py)."""
        if not self.has_symmetries:
            ones = jnp.ones(spins.shape, dtype=jnp.float64)
            return spins, jnp.ones(spins.shape, dtype=bool), ones
        rep, _, is_rep, stab = self._orbit_reduce_device(spins)
        return rep, is_rep, stab

    def __repr__(self) -> str:
        built = self._states is not None
        return (
            f"SpinBasis(number_spins={self.number_spins}, "
            f"hamming_weight={self.hamming_weight}, "
            f"spin_inversion={self.spin_inversion}, "
            f"symmetries={len(self.symmetries)}, "
            f"states={'%d' % self._states.shape[0] if built else '<unbuilt>'})"
        )
