"""Auxiliary classical Ising models built from quantum amplitudes.

The central object of the framework (reference: make_ising_model,
common.py:131-208 and the gen-1 C kernel cbits/build_matrix.c:22-65):
given a subset K of basis states and log-amplitudes of the wavefunction,
build the classical Ising Hamiltonian

    E(s) = sum_ij s_i J_ij s_j + sum_i h_i s_i,
    J_ij = <s_i|H|s_j> * |psi_i| * |psi_j|   (i, j in K)

whose ground state reproduces the signs of psi. The construction is a
single jitted pipeline: padded operator application -> vectorised
searchsorted membership -> element products. Shapes are bucketed to powers
of two so the growing-cluster pipeline reuses compiled programs.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse
from scipy.sparse.csgraph import connected_components

from . import bits as _bits
from .operator import Operator
from .utils.log import logger

__all__ = [
    "IsingHamiltonian",
    "IsingModel",
    "make_ising_model",
    "make_hamiltonian_extension",
    "sparsify_using_global_cutoff",
    "dump_ising_model_to_hdf5",
    "load_ising_model_from_hdf5",
    "binary_search",
]


class IsingHamiltonian:
    """Classical Ising Hamiltonian: sparse symmetric exchange + linear field.

    Mirrors the surface of ``ising_glass_annealer.Hamiltonian``
    (common.py:204,654-675, full_hilbert_space.py:143-145): ``exchange``
    (scipy sparse, symmetric, includes the diagonal), ``field`` (dense),
    ``energy(x)`` where x is a packed-bit configuration.
    """

    def __init__(self, exchange: scipy.sparse.spmatrix, field: np.ndarray):
        exchange = exchange.tocsr()
        self.exchange = exchange
        self.field = np.asarray(field, dtype=np.float64)
        if self.exchange.shape[0] != self.field.shape[0]:
            raise ValueError("exchange and field have incompatible shapes")
        self._device_ell = None

    @property
    def shape(self):
        return self.exchange.shape

    @property
    def size(self) -> int:
        return self.exchange.shape[0]

    def energy(self, x) -> float:
        """E(s) = s^T J s + h^T s for a packed-bit configuration ``x``
        (or a ±1 sign vector)."""
        x = np.asarray(x)
        if x.dtype == np.uint64:
            signs = _bits.bits_to_signs(x, self.size)
        else:
            signs = x.astype(np.float64)
        return float(signs @ (self.exchange @ signs) + self.field @ signs)

    def energies(self, signs: np.ndarray) -> np.ndarray:
        """Batched energies for (R, K) ±1 sign matrix."""
        signs = np.asarray(signs, dtype=np.float64)
        return np.einsum("rk,rk->r", signs, signs @ self.exchange.T) + signs @ self.field

    # -- device neighbour-list form (used by the SA solver) ------------------

    def device_ell(self, dtype=jnp.float32):
        """Padded off-diagonal neighbour-list (ELL) form on device:
        (neighbour_idx (K, D) int32, couplings (K, D) dtype, field (K,)).

        The diagonal is constant under spin flips and excluded. Rows are
        padded with a sentinel index K whose sign is pinned to zero inside
        the annealer.
        """
        if self._device_ell is None or self._device_ell[0] != str(dtype):
            m = self.exchange.tocoo()
            mask = m.row != m.col
            rows, cols, vals = m.row[mask], m.col[mask], m.data[mask]
            # symmetrise into "all neighbours of i" adjacency
            src = np.concatenate([rows, cols])
            dst = np.concatenate([cols, rows])
            w = np.concatenate([vals, vals])
            order = np.argsort(src, kind="stable")
            src, dst, w = src[order], dst[order], w[order]
            counts = np.bincount(src, minlength=self.size)
            D = max(int(counts.max()) if counts.size else 0, 1)
            K = self.size
            idx = np.full((K, D), K, dtype=np.int32)
            val = np.zeros((K, D), dtype=np.float64)
            offsets = np.zeros(K + 1, dtype=np.int64)
            np.cumsum(counts, out=offsets[1:])
            slot = np.arange(len(src)) - offsets[src]
            idx[src, slot] = dst
            val[src, slot] = w
            self._device_ell = (
                str(dtype),
                jnp.asarray(idx),
                jnp.asarray(val, dtype=dtype),
                jnp.asarray(self.field, dtype=dtype),
            )
        return self._device_ell[1], self._device_ell[2], self._device_ell[3]


@dataclass
class IsingModel:
    """(spins in K, quantum Hamiltonian, classical Ising Hamiltonian,
    packed initial signs) — mirrors the reference dataclass
    (common.py:46-55)."""

    spins: np.ndarray
    quantum_hamiltonian: Operator
    ising_hamiltonian: IsingHamiltonian
    initial_signs: np.ndarray

    @property
    def size(self) -> int:
        return self.spins.shape[0]


def _bucket_size(n: int) -> int:
    """Round up to the next power of two (>= 128) to bound recompiles."""
    b = 128
    while b < n:
        b <<= 1
    return b


@functools.partial(jax.jit, static_argnums=(0,))
def _build_elements(
    operator: Operator,
    spins: jax.Array,
    abs_psi: jax.Array,
    valid: jax.Array,
    row_spins: jax.Array,
    row_abs: jax.Array,
    row_valid: jax.Array,
):
    """Jitted core of the Ising build for one row block: returns (neighbour
    index (R, W), member mask, elements (R, W) f64, outside contribution
    terms). The lookup tables (``spins``/``abs_psi``/``valid``) cover the
    whole cluster; the rows are a block so the symmetry orbit-reduction
    intermediates inside ``apply_padded`` — (R, W, |G|) — stay bounded."""
    nbrs, coeffs = operator.apply_padded(row_spins)
    idx = jnp.clip(jnp.searchsorted(spins, nbrs), 0, spins.shape[0] - 1)
    member = (spins[idx] == nbrs) & valid[idx]
    e = coeffs * jnp.where(member, abs_psi[idx], 0.0) * row_abs[:, None]
    e = jnp.where(row_valid[:, None], e, 0.0)
    return idx.astype(jnp.int32), member, e, nbrs, coeffs


def _apply_row_block(operator: Operator, budget_bytes: int = 600 << 20) -> int:
    """Rows per device dispatch such that the (R, W, |G|) f32 orbit-reduction
    intermediates (~6 live arrays) fit in ``budget_bytes``. Power of two for
    compile-cache reuse; symmetry-free bases (|G| = 1) have tiny rows and
    effectively stay single-dispatch."""
    W = operator.max_neighbours
    G = operator.basis.group_size if operator.basis.has_symmetries else 1
    per_row = max(W * G * 4 * 6, 1)
    r = 128
    while 2 * r * per_row <= budget_bytes and r < 65536:
        r <<= 1
    return r


def make_ising_model(
    spins: np.ndarray,
    quantum_hamiltonian: Operator,
    log_psi: Optional[np.ndarray] = None,
    log_psi_fn: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    scale_field: float = 0.0,
    external_field: bool = False,
) -> IsingModel:
    """Build the auxiliary Ising model on the spin set K.

    Matches the semantics of the reference implementation
    (common.py:131-208): spins are unique-ified and sorted, psi is
    normalised and must be real, elements are J_ij = c_ij |psi_i||psi_j|
    for j in K, the matrix is symmetrised as (M + M^T)/2, and the initial
    configuration packs the signs of psi. ``scale_field``/``external_field``
    optionally accumulate out-of-K contributions into the linear field
    (the gen-1 behaviour, cbits/build_matrix.c:49).
    """
    if log_psi is None and log_psi_fn is None:
        raise ValueError("at least one of log_psi or log_psi_fn should be specified")
    if (external_field or scale_field != 0.0) and log_psi_fn is None:
        raise ValueError("log_psi_fn should be specified when external_field=True")

    spins = _bits.spins_to_array(spins)
    unique_spins, first_index, counts = np.unique(
        spins, return_index=True, return_counts=True
    )
    if unique_spins.shape[0] != spins.shape[0]:
        logger.warning("'spins' were not unique, are you sure this is what you want?")
        if log_psi is not None:
            log_psi = np.asarray(log_psi)[first_index]
    spins = unique_spins
    n = spins.shape[0]
    if log_psi is None:
        log_psi = log_psi_fn(spins)
    log_psi = np.asarray(log_psi)

    # real wavefunction from complex log: psi = exp(a) * cos(b), b in {0, pi}
    if np.iscomplexobj(log_psi):
        phase = np.cos(log_psi.imag)
        if not np.allclose(np.abs(np.sin(log_psi.imag)), 0.0, atol=1e-6):
            raise ValueError("expected all wavefunction coefficients to be real")
        amp = np.exp(log_psi.real)
    else:
        phase = np.ones(n)
        amp = np.exp(log_psi)
    psi = np.sign(phase) * amp
    psi /= np.linalg.norm(psi)
    abs_psi = np.abs(psi)

    # --- bucketed, jitted element construction ---
    B = _bucket_size(n)
    spins_padded = np.full(B, spins[-1], dtype=np.uint64)
    spins_padded[:n] = spins
    abs_padded = np.zeros(B, dtype=np.float64)
    abs_padded[:n] = abs_psi
    valid = np.zeros(B, dtype=bool)
    valid[:n] = True

    spins_dev = jnp.asarray(spins_padded)
    abs_dev = jnp.asarray(abs_padded)
    valid_dev = jnp.asarray(valid)
    Rb = min(B, _apply_row_block(quantum_hamiltonian))
    blocks = []
    for s in range(0, B, Rb):
        blocks.append(
            _build_elements(
                quantum_hamiltonian,
                spins_dev,
                abs_dev,
                valid_dev,
                spins_dev[s : s + Rb],
                abs_dev[s : s + Rb],
                valid_dev[s : s + Rb],
            )
        )
    idx = np.concatenate([np.asarray(b[0]) for b in blocks])[:n]
    member = np.concatenate([np.asarray(b[1]) for b in blocks])[:n]
    elements = np.concatenate(
        [np.asarray(b[2], dtype=np.float64) for b in blocks]
    )[:n]
    idx = np.where(member, idx, 0)  # padded-slot indices may exceed n

    W = idx.shape[1]
    rows = np.repeat(np.arange(n, dtype=np.int64), W).reshape(n, W)
    e_flat = np.where(member, elements, 0.0).reshape(-1)
    matrix = scipy.sparse.csr_matrix(
        (e_flat, (rows.reshape(-1), idx.reshape(-1).astype(np.int64))), shape=(n, n)
    )
    matrix.sum_duplicates()
    matrix.eliminate_zeros()
    matrix = 0.5 * (matrix + matrix.T)
    matrix.sort_indices()

    field = np.zeros(n, dtype=np.float64)
    if external_field or scale_field != 0.0:
        # out-of-K contributions: h_i = sum_{j not in K} c_ij |psi_i| psi_j
        # (signed psi_j — cbits/build_matrix.c:49)
        nbrs_h = np.concatenate([np.asarray(b[3]) for b in blocks])[:n]
        coeffs_h = np.concatenate([np.asarray(b[4]) for b in blocks])[:n]
        outside = (~member) & (coeffs_h != 0.0)
        if outside.any():
            out_states = nbrs_h[outside]
            out_log = np.asarray(log_psi_fn(out_states))
            if np.iscomplexobj(out_log):
                out_psi = np.exp(out_log.real) * np.cos(out_log.imag)
            else:
                out_psi = np.exp(out_log)
            # outside amplitudes share the in-K normalisation of psi
            out_psi = out_psi / np.linalg.norm(amp)
            contrib = coeffs_h[outside] * out_psi
            rows_out = np.repeat(np.arange(n), outside.sum(axis=1))
            np.add.at(field, rows_out, contrib)
            field *= abs_psi
            if not external_field:
                field *= float(scale_field)

    ising = IsingHamiltonian(matrix, field)
    x0 = _bits.signs_to_bits(np.sign(psi))
    return IsingModel(spins, quantum_hamiltonian, ising, x0)


def _apply_padded_host(operator: Operator, spins: np.ndarray):
    """Host-side chunked ``apply_padded``: pads each row block to a fixed
    power-of-two shape (one compiled program) and keeps the per-dispatch
    orbit-reduction footprint bounded. Returns numpy (nbrs, coeffs)."""
    spins = np.asarray(spins, dtype=np.uint64)
    Rb = _apply_row_block(operator)
    outs_n, outs_c = [], []
    for s in range(0, spins.shape[0], Rb):
        chunk = spins[s : s + Rb]
        pad = Rb - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.full(pad, chunk[-1], dtype=np.uint64)])
        nb, cf = operator.apply_padded(jnp.asarray(chunk))
        nb, cf = np.asarray(nb), np.asarray(cf)
        if pad:
            nb, cf = nb[:-pad], cf[:-pad]
        outs_n.append(nb)
        outs_c.append(cf)
    return np.concatenate(outs_n), np.concatenate(outs_c)


def make_hamiltonian_extension(
    model: IsingModel,
    log_psi_fn: Callable[[np.ndarray], np.ndarray],
) -> IsingModel:
    """Extend the spin set by one Hamiltonian hop: K <- K ∪ H·K and rebuild
    (common.py:516-522)."""
    nbrs, coeffs = _apply_padded_host(model.quantum_hamiltonian, model.spins)
    touched = np.unique(nbrs[coeffs != 0.0])
    spins = np.union1d(model.spins, touched)
    return make_ising_model(spins, model.quantum_hamiltonian, log_psi_fn=log_psi_fn)


def get_strongest_off_diag(matrix: scipy.sparse.spmatrix) -> np.ndarray:
    """Per-row maximum |off-diagonal coupling| (common.py:525-541),
    vectorised instead of the reference's numba row loop."""
    coo = matrix.tocoo()
    off = coo.row != coo.col
    out = np.zeros(matrix.shape[0], dtype=np.float64)
    np.maximum.at(out, coo.row[off], np.abs(coo.data[off]))
    return out


def make_hamiltonian_extension_reltol(
    model: IsingModel,
    log_psi_fn: Callable[[np.ndarray], np.ndarray],
    reltol: float = 1e-2,
) -> np.ndarray:
    """Selective one-hop extension: include a generated state s' only when
    its relative coupling |c| |psi_s| |psi_s'| / strongest(s) exceeds
    ``reltol`` (the gen-1 inclusion-mask extension,
    sampled_connected_components.py:449-484). Returns the extended spin
    set."""
    spins = model.spins
    nbrs, coeffs = _apply_padded_host(model.quantum_hamiltonian, spins)
    # slot 0 of apply_padded is by construction the diagonal (self) term;
    # the one-hop extension must drop exactly that slot, so fail loudly if
    # an operator-layout change ever moves it (a silent violation would
    # corrupt the local-energy cluster machinery downstream)
    if not np.array_equal(nbrs[:, 0], spins):
        raise AssertionError(
            "apply_padded slot 0 is not the diagonal term; "
            "make_hamiltonian_extension_reltol assumes the self state "
            "occupies slot 0 of every padded neighbour row"
        )
    nbrs = nbrs[:, 1:]
    coeffs = coeffs[:, 1:]

    log_psi = np.asarray(log_psi_fn(spins))
    log_psi_ext = np.asarray(log_psi_fn(nbrs.reshape(-1))).reshape(nbrs.shape)
    strongest = np.log(
        np.maximum(get_strongest_off_diag(model.ising_hamiltonian.exchange), 1e-300)
    )
    with np.errstate(divide="ignore"):
        log_couplings = (
            np.log(np.abs(coeffs))
            + log_psi_ext.real
            + log_psi.real[:, None]
            - strongest[:, None]
        )
    mask = (coeffs != 0.0) & (log_couplings >= np.log(reltol))
    extended = np.union1d(spins, nbrs[mask])
    logger.debug(
        "{:.1f}% included; there are now {} spins in the cluster",
        100.0 * mask.sum() / max(mask.size, 1),
        len(extended),
    )
    return extended


def binary_search(haystack: np.ndarray, needles: np.ndarray) -> np.ndarray:
    """Exact sorted lookup (common.py:544-548)."""
    indices = np.searchsorted(haystack, needles)
    indices = np.clip(indices, 0, haystack.shape[0] - 1)
    if not np.all(haystack[indices] == needles):
        raise KeyError("some needles are missing from the haystack")
    return indices


def sparsify_using_global_cutoff(
    model: IsingModel, reltol: float, frozen_spins: np.ndarray
) -> IsingModel:
    """Drop couplings with |J| < reltol * max|J| unless both endpoints are
    frozen; keep the connected component containing the frozen cluster
    (common.py:647-692)."""
    frozen_spins = _bits.spins_to_array(frozen_spins)
    frozen_indices = binary_search(model.spins, frozen_spins)
    is_frozen = np.zeros(model.size, dtype=bool)
    is_frozen[frozen_indices] = True

    matrix = model.ising_hamiltonian.exchange.tocoo()
    max_coupling = np.abs(matrix.data).max() if matrix.nnz else 0.0
    keep = (np.abs(matrix.data) >= reltol * max_coupling) | (
        is_frozen[matrix.row] & is_frozen[matrix.col]
    )
    pruned = scipy.sparse.coo_matrix(
        (matrix.data[keep], (matrix.row[keep], matrix.col[keep])),
        shape=matrix.shape,
    ).tocsr()
    pruned = 0.5 * (pruned + pruned.T)

    _, component = connected_components(pruned, directed=False)
    magic = component[frozen_indices[0]]
    if not np.all(component[frozen_indices] == magic):
        raise RuntimeError("frozen cluster was split by sparsification")
    mask = component == magic

    spins = model.spins[mask]
    signs = _bits.bits_to_signs(model.initial_signs, model.size)[mask]
    exchange = model.ising_hamiltonian.exchange[mask][:, mask]
    field = model.ising_hamiltonian.field[mask]
    new_model = IsingModel(
        spins,
        model.quantum_hamiltonian,
        IsingHamiltonian(exchange, field),
        _bits.signs_to_bits(signs),
    )
    logger.info(
        "number of spins: {} -> {}; number of connections: {} -> {}",
        model.size,
        new_model.size,
        matrix.nnz,
        exchange.nnz,
    )
    return new_model


def dump_ising_model_to_hdf5(
    model: IsingModel, ground_state: np.ndarray, filename: str
) -> None:
    """Golden-fixture dump in the reference schema (common.py:750-769,
    test_cases.py:10-31)."""
    import h5py

    matrix = model.ising_hamiltonian.exchange.tocsr()
    energy = model.quantum_hamiltonian.expectation(np.asarray(ground_state))
    with h5py.File(filename, "w") as out:
        out["elements"] = np.asarray(matrix.data, dtype=np.float64)
        out["indices"] = np.asarray(matrix.indices, dtype=np.int32)
        out["indptr"] = np.asarray(matrix.indptr, dtype=np.int32)
        out["field"] = np.asarray(model.ising_hamiltonian.field, dtype=np.float64)
        out["energy"] = energy
        out["signs"] = _bits.signs_to_bits(np.sign(ground_state))


def load_ising_model_from_hdf5(filename: str) -> Tuple[IsingHamiltonian, np.ndarray, float]:
    """Read a golden fixture back: (hamiltonian, packed signs, energy)."""
    import h5py

    with h5py.File(filename, "r") as f:
        data = np.asarray(f["elements"], dtype=np.float64)
        indices = np.asarray(f["indices"], dtype=np.int32)
        indptr = np.asarray(f["indptr"], dtype=np.int32)
        field = np.asarray(f["field"], dtype=np.float64)
        energy = float(np.asarray(f["energy"]))
        signs = np.asarray(f["signs"], dtype=np.uint64)
    n = field.shape[0]
    matrix = scipy.sparse.csr_matrix((data, indices, indptr), shape=(n, n))
    return IsingHamiltonian(matrix, field), signs, energy
