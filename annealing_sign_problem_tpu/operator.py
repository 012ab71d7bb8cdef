"""Hamiltonian operator engine: compiled two-site term tables.

Replaces the surface of ``lattice_symmetries.Operator`` used by the
reference (SURVEY §2.3: ``op.apply``, ``op.batched_apply``,
``op.expectation`` — call sites common.py:29,96,759). A Hamiltonian is a
sum of two-site terms, each a real 4x4 matrix acting on a pair of sites in
the basis |b_i b_j> with index k = 2*b_i + b_j (YAML schema of
physical_systems/*.yaml, e.g. j1j2_square_4x4.yaml:11-41).

TPU-first design: instead of returning ragged (state, coeff) lists like the
reference C++ library, ``apply_padded`` produces *static-shape* padded
arrays — one neighbour slot per term-pair plus a diagonal slot — with zero
coefficients marking inactive slots. Zero-padded slots are harmless
everywhere downstream (Ising matrix entries of zero, matvec contributions
of zero), which removes all data-dependent shapes from the hot path.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import bits as _bits
from .basis import SpinBasis

__all__ = ["Operator", "TermGroup"]


@dataclass(frozen=True)
class TermGroup:
    """A 4x4 two-site matrix applied to a list of site pairs."""

    matrix: np.ndarray  # (4, 4) float64
    sites: np.ndarray  # (m, 2) int32

    def __post_init__(self):
        m = np.asarray(self.matrix, dtype=np.float64)
        s = np.asarray(self.sites, dtype=np.int32)
        if m.shape != (4, 4):
            raise ValueError(f"term matrix must be 4x4, got {m.shape}")
        if s.ndim != 2 or s.shape[1] != 2:
            raise ValueError(f"sites must be (m, 2), got {s.shape}")
        object.__setattr__(self, "matrix", m)
        object.__setattr__(self, "sites", s)


class Operator:
    """A compiled sum of two-site terms over a :class:`SpinBasis`.

    The compiled form is a set of per-pair tables (P = total site pairs):

    - ``site_i``, ``site_j``: (P,) static site indices
    - ``diag_table``: (P, 4) diagonal matrix elements per two-bit index k
    - ``offdiag_table``: (P, 4) coefficient of the *exchange* entry reached
      from k (nonzero only for k in {1, 2} for hamming-conserving terms)
    - ``offdiag_target``: (P, 4) the two-bit index reached from k

    Arbitrary real 4x4 matrices are supported as long as each column has at
    most one nonzero off-diagonal entry (true for every reference system:
    Heisenberg/SK terms only couple |01> <-> |10>).
    """

    def __init__(self, basis: SpinBasis, terms: Sequence[TermGroup]):
        self.basis = basis
        self.terms = [t if isinstance(t, TermGroup) else TermGroup(*t) for t in terms]
        site_i, site_j, diag_rows, off_rows, tgt_rows = [], [], [], [], []
        for t in self.terms:
            m = t.matrix
            if not np.allclose(m.imag if np.iscomplexobj(m) else 0.0, 0.0):
                # mirrors the reference's realness check (common.py:30-31,97-98)
                raise ValueError("expected all Hamiltonian matrix elements to be real")
            off = np.zeros(4)
            tgt = np.arange(4)
            for k in range(4):
                nz = [kp for kp in range(4) if kp != k and m[kp, k] != 0.0]
                if len(nz) > 1:
                    raise NotImplementedError(
                        "term matrices with more than one off-diagonal entry "
                        "per column are not supported"
                    )
                if nz:
                    off[k] = m[nz[0], k]
                    tgt[k] = nz[0]
            for (i, j) in t.sites:
                site_i.append(i)
                site_j.append(j)
                diag_rows.append(np.diag(m))
                off_rows.append(off)
                tgt_rows.append(tgt)
        self.number_pairs = len(site_i)
        self._site_i = np.asarray(site_i, dtype=np.int32)
        self._site_j = np.asarray(site_j, dtype=np.int32)
        self._diag_table = np.asarray(diag_rows, dtype=np.float64)  # (P, 4)
        self._offdiag_table = np.asarray(off_rows, dtype=np.float64)  # (P, 4)
        self._offdiag_target = np.asarray(tgt_rows, dtype=np.int64)  # (P, 4)
        # XOR masks: flipping from two-bit index k to offdiag_target[k]
        ii = np.uint64(1) << self._site_i.astype(np.uint64)
        jj = np.uint64(1) << self._site_j.astype(np.uint64)
        k = np.arange(4)
        flip_i = ((k[None, :] >> 1) ^ (self._offdiag_target >> 1)).astype(np.uint64)
        flip_j = ((k[None, :] & 1) ^ (self._offdiag_target & 1)).astype(np.uint64)
        self._flip_mask = flip_i * ii[:, None] + flip_j * jj[:, None]  # (P, 4) uint64
        self._ell_cache = {}

    # -- core padded application (jitted) -------------------------------------

    @property
    def max_neighbours(self) -> int:
        """Static width of the padded neighbour axis (P pairs + self slot)."""
        return self.number_pairs + 1

    @functools.partial(jax.jit, static_argnums=(0,))
    def apply_padded(self, spins: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Apply H to packed states: (B,) uint64 -> neighbours (B, P+1)
        uint64 and coefficients (B, P+1) float64.

        Slot 0 is the diagonal (the state itself); slots 1..P are one
        potential neighbour per term pair, with coefficient 0 when the pair
        is inactive for that state. With a symmetry-adapted basis the
        neighbours are representatives and coefficients carry the character
        and sqrt-norm factors of the symmetrised matrix elements.
        """
        spins = jnp.asarray(spins, dtype=jnp.uint64)
        si = jnp.asarray(self._site_i.astype(np.uint64))
        sj = jnp.asarray(self._site_j.astype(np.uint64))
        bi = (spins[:, None] >> si) & jnp.uint64(1)  # (B, P)
        bj = (spins[:, None] >> sj) & jnp.uint64(1)
        k = (2 * bi + bj).astype(jnp.int32)  # (B, P)

        diag_t = jnp.asarray(self._diag_table)
        off_t = jnp.asarray(self._offdiag_table)
        flip_t = jnp.asarray(self._flip_mask)

        p_idx = jnp.arange(self.number_pairs)[None, :]
        diag = jnp.sum(diag_t[p_idx, k], axis=1)  # (B,)
        off_coeff = off_t[p_idx, k]  # (B, P)
        flip = flip_t[p_idx, k]  # (B, P) uint64
        nbrs = spins[:, None] ^ flip  # inactive slots have flip == 0 -> self

        coeffs = jnp.concatenate([diag[:, None], off_coeff], axis=1)
        nbrs = jnp.concatenate([spins[:, None], nbrs], axis=1)

        if self.basis.has_symmetries:
            rep, chi = self.basis.state_info_device(nbrs)
            coeffs = coeffs * chi
            nbrs = rep
            # norm factors sqrt(n_r' / n_r): applied by callers who know the
            # basis norms; for reference systems without permutation
            # symmetries all norms are 1 (spin inversion has no fixed points
            # at hamming weight n/2), so chi is the whole story. For general
            # groups use apply_padded_normalised.
        # zero out inactive slots explicitly (diag slot always active)
        active = jnp.concatenate(
            [jnp.ones((spins.shape[0], 1), dtype=bool), off_coeff != 0.0], axis=1
        )
        coeffs = jnp.where(active, coeffs, 0.0)
        return nbrs, coeffs

    def apply_padded_normalised(self, spins: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Like :meth:`apply_padded` but multiplies coefficients by
        sqrt(n_r'/n_r) for symmetry groups with nontrivial stabilisers."""
        nbrs, coeffs = self.apply_padded(spins)
        if not self.basis.has_symmetries:
            return nbrs, coeffs
        norms = jnp.asarray(self.basis.norms)
        idx_r = self.basis.index_device(jnp.asarray(spins, dtype=jnp.uint64))
        idx_n = self.basis.index_device(nbrs)
        member = self.basis.states_device[idx_n] == nbrs
        factor = jnp.sqrt(jnp.where(member, norms[idx_n], 1.0) / norms[idx_r][:, None])
        return nbrs, coeffs * factor

    # -- host-facing adapters (reference-compatible surface) -------------------

    def apply(self, spin) -> Tuple[np.ndarray, np.ndarray]:
        """H|s> for a single state: (neighbour states, coefficients), with
        inactive slots removed. Mirrors ``op.apply`` (common.py:29)."""
        spins = _bits.spins_to_array(spin)
        nbrs, coeffs = self.apply_padded(jnp.asarray(spins))
        nbrs = np.asarray(nbrs[0])
        coeffs = np.asarray(coeffs[0])
        mask = coeffs != 0.0
        mask[0] = True
        return nbrs[mask], coeffs[mask]

    def batched_apply(self, spins, chunk_size: int = 65536):
        """Flattened (other_spins, other_coeffs, other_counts) like the
        reference's ``_batched_apply`` (common.py:85-106), keeping inactive
        slots out of the output."""
        spins = _bits.spins_to_array(spins)
        out_spins, out_coeffs, out_counts = [], [], []
        for start in range(0, spins.shape[0], chunk_size):
            chunk = spins[start : start + chunk_size]
            nbrs, coeffs = self.apply_padded(jnp.asarray(chunk))
            nbrs = np.asarray(nbrs)
            coeffs = np.asarray(coeffs)
            mask = coeffs != 0.0
            mask[:, 0] = True
            counts = mask.sum(axis=1)
            out_spins.append(nbrs[mask])
            out_coeffs.append(coeffs[mask])
            out_counts.append(counts)
        return (
            np.concatenate(out_spins),
            np.concatenate(out_coeffs),
            np.concatenate(out_counts).astype(np.int64),
        )

    # -- basis-resolved ELL form and linear algebra -----------------------------

    def build_ell(self, dtype=jnp.float64) -> Tuple[jax.Array, jax.Array]:
        """Resolve neighbours to basis indices for the whole basis: returns
        (indices (K, P+1) int32, coefficients (K, P+1) dtype). Out-of-basis
        neighbours get coefficient 0 and index 0.

        This is the cached sparse-matrix-free form used by :meth:`matvec`
        (the Lanczos hot loop) and by the Ising-model builder.
        """
        key = ("ell", np.dtype(dtype).name)
        if key not in self._ell_cache:
            states = self.basis.states_device

            @jax.jit
            def _build(chunk):
                nbrs, coeffs = self.apply_padded(chunk)
                idx = jnp.clip(jnp.searchsorted(states, nbrs), 0, states.shape[0] - 1)
                member = states[idx] == nbrs
                coeffs = jnp.where(member, coeffs, 0.0)
                idx = jnp.where(member, idx, 0)
                return idx.astype(jnp.int32), coeffs.astype(dtype)

            K = states.shape[0]
            chunk = 1 << 16
            parts = [_build(states[s : s + chunk]) for s in range(0, K, chunk)]
            idx = jnp.concatenate([p[0] for p in parts])
            coeffs = jnp.concatenate([p[1] for p in parts])
            self._ell_cache[key] = (idx, coeffs)
        return self._ell_cache[key]

    def matvec(self, x: jax.Array) -> jax.Array:
        """y = H x over the full basis (matrix-free via the cached ELL)."""
        idx, coeffs = self.build_ell(dtype=x.dtype)
        return jnp.sum(coeffs * x[idx], axis=1)

    def expectation(self, psi) -> float:
        """<psi|H|psi> / <psi|psi>. Mirrors ``op.expectation`` (common.py:759)."""
        x = jnp.asarray(psi)
        hx = self.matvec(x)
        return float(jnp.vdot(x, hx) / jnp.vdot(x, x))

    def to_scipy_sparse(self):
        """Dense-index COO sparse matrix (host, float64) — for tests and
        small-system exact diagonalisation cross-checks."""
        import scipy.sparse

        idx, coeffs = self.build_ell(dtype=jnp.float64)
        idx = np.asarray(idx)
        coeffs = np.asarray(coeffs)
        K, W = idx.shape
        rows = np.repeat(np.arange(K, dtype=np.int64), W)
        m = scipy.sparse.coo_matrix(
            (coeffs.reshape(-1), (rows, idx.reshape(-1).astype(np.int64))), shape=(K, K)
        )
        m.sum_duplicates()
        m.eliminate_zeros()
        return m.tocsr()

    def __repr__(self) -> str:
        return (
            f"Operator(pairs={self.number_pairs}, terms={len(self.terms)}, "
            f"basis={self.basis!r})"
        )
