"""Neural sign classifiers (flax).

TPU-native re-designs of the reference's torch model zoo (SURVEY §2.1):

- :class:`DenseSignModel` — MLP over ±1 spins (train.py:761-782)
- :class:`ConvSignModel` — periodic 2-D CNN (train.py:703-758; the manual
  circular padding of ConvBlock becomes ``padding='CIRCULAR'``)
- :class:`LatticeConvolution` — sublattice-shared-weight graph convolution
  over fixed neighbourhoods (models.py:8-64); the per-site Python loop of
  the reference becomes a single gather + einsum that XLA maps onto the MXU
- :class:`KagomeSignNetwork` / :class:`KagomeResidualNetwork` — lattice-conv
  stacks with sublattice mean-pooling (train.py:1304-1402)
- :class:`GraphConvolution` / :class:`GraphSignModel` — dense-adjacency GCN
  (train.py:785-848)

All models take *packed* uint64 spin configurations and emit 2 logits
(sign classes); bit unpacking (the reference's external CUDA ``unpack_bits``
kernel) is a fused XLA op.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import bits as _bits
from .adjacency import kagome_adjacency

__all__ = [
    "mish",
    "DenseSignModel",
    "ConvSignModel",
    "LatticeConvolution",
    "KagomeSignNetwork",
    "KagomeResidualNetwork",
    "GraphConvolution",
    "GraphSignModel",
]


def mish(x):
    """x * tanh(softplus(x)) (train.py:695-700)."""
    return x * jnp.tanh(jax.nn.softplus(x))


def _unpack(x, number_spins, dtype):
    if x.dtype in (jnp.uint64, jnp.int64, jnp.uint32, jnp.int32):
        return _bits.unpack(x.astype(jnp.uint64), number_spins, dtype=dtype)
    return x.astype(dtype)


class DenseSignModel(nn.Module):
    """MLP sign classifier: unpack -> [Linear, ReLU, (BatchNorm), (Dropout)]*
    -> 2 logits."""

    number_spins: int
    features: Sequence[int] = (64, 64)
    use_batchnorm: bool = True
    dropout: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _unpack(x, self.number_spins, self.dtype)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype)(x)
            x = nn.relu(x)
            if self.use_batchnorm:
                x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
            if self.dropout is not None:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(2, dtype=self.dtype)(x)


class ConvSignModel(nn.Module):
    """Periodic 2-D CNN sign classifier for square lattices."""

    shape: Tuple[int, int]
    channels: Sequence[int] = (32, 32)
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = self.shape[0] * self.shape[1]
        x = _unpack(x, n, self.dtype)
        x = x.reshape(x.shape[0], self.shape[0], self.shape[1], 1)
        for c in self.channels:
            x = nn.Conv(
                c,
                (self.kernel_size, self.kernel_size),
                padding="CIRCULAR",
                dtype=self.dtype,
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(2, dtype=self.dtype)(x)


class LatticeConvolution(nn.Module):
    """Sublattice-shared-weight convolution over fixed neighbourhoods.

    weight: (sublattices, C_in, K, C_out); site i with sublattice s_i and
    neighbourhood N_i computes out[:, :, i] = x[:, :, N_i] . W[s_i] + b[s_i].
    One gather + one einsum — batched onto the MXU instead of the
    reference's per-site Python loop (models.py:49-59).
    """

    sublattice: np.ndarray  # (N,) int32
    neighbourhoods: np.ndarray  # (N, K) int32
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, C_in, N)
        B, C_in, N = x.shape
        K = self.neighbourhoods.shape[1]
        S = int(self.sublattice.max()) + 1
        k = 1.0 / (C_in * K)
        init = nn.initializers.uniform(scale=2 * np.sqrt(k))

        def shifted(key, shape, dtype=jnp.float32):
            # U(-sqrt(k), sqrt(k)) — the reference's reset_parameters
            # (models.py:61-64)
            return init(key, shape, dtype) - np.sqrt(k)

        weight = self.param("weight", shifted, (S, C_in, K, self.features))
        bias = self.param("bias", shifted, (S, self.features))

        nbh = jnp.asarray(self.neighbourhoods)
        sub = jnp.asarray(self.sublattice)
        gathered = x[:, :, nbh]  # (B, C_in, N, K)
        w_site = jnp.asarray(weight, dtype=self.dtype)[sub]  # (N, C_in, K, F)
        out = jnp.einsum("bcnk,nckf->bfn", gathered.astype(self.dtype), w_site)
        out = out + jnp.asarray(bias, dtype=self.dtype)[sub].T[None]
        return out


class KagomeSignNetwork(nn.Module):
    """3 x LatticeConvolution + sublattice mean-pool + linear -> 2 logits
    (train.py:1361-1402)."""

    number_spins: int
    channels: int = 28
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sub, nbh = kagome_adjacency(self.number_spins)
        x = _unpack(x, self.number_spins, self.dtype)[:, None, :]  # (B, 1, N)
        for _ in range(3):
            x = nn.relu(LatticeConvolution(sub, nbh, self.channels, self.dtype)(x))
        pooled = _sublattice_mean(x, sub)
        return nn.Dense(2, dtype=self.dtype)(pooled.reshape(x.shape[0], -1))


def _sublattice_mean(x, sublattice):
    """Mean-pool channels over each sublattice: (B, C, N) -> (B, C, S)."""
    S = int(sublattice.max()) + 1
    cols = []
    for t in range(S):
        idx = jnp.asarray(np.nonzero(sublattice == t)[0])
        cols.append(x[:, :, idx].mean(axis=2))
    return jnp.stack(cols, axis=2)


class _KagomeResidualBlock(nn.Module):
    number_spins: int
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        sub, nbh = kagome_adjacency(self.number_spins)
        y = LatticeConvolution(sub, nbh, self.channels, self.dtype)(x)
        y = nn.relu(y)
        y = LatticeConvolution(sub, nbh, self.channels, self.dtype)(y)
        return nn.relu(x + y)


class KagomeResidualNetwork(nn.Module):
    """Residual lattice-conv stack (train.py:1330-1358)."""

    number_spins: int
    channels: int = 28
    blocks: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        sub, nbh = kagome_adjacency(self.number_spins)
        x = _unpack(x, self.number_spins, self.dtype)[:, None, :]
        x = nn.relu(LatticeConvolution(sub, nbh, self.channels, self.dtype)(x))
        for _ in range(self.blocks):
            x = _KagomeResidualBlock(self.number_spins, self.channels, self.dtype)(x)
        pooled = _sublattice_mean(x, sub)
        return nn.Dense(2, dtype=self.dtype)(pooled.reshape(x.shape[0], -1))


class GraphConvolution(nn.Module):
    """Dense-adjacency GCN layer: adj @ (x W) + b (train.py:785-818)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, adj):
        # x: (B, N, C); adj: (N, N)
        support = nn.Dense(self.features, dtype=self.dtype)(x)
        return jnp.einsum("mn,bnf->bmf", adj.astype(self.dtype), support)


class GraphSignModel(nn.Module):
    """Two GCN layers + linear head over a dense adjacency matrix
    (train.py:821-848)."""

    number_spins: int
    adjacency: np.ndarray  # (N, N)
    features: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        adj = jnp.asarray(self.adjacency, dtype=self.dtype)
        x = _unpack(x, self.number_spins, self.dtype)[..., None]  # (B, N, 1)
        x = nn.relu(GraphConvolution(self.features, self.dtype)(x, adj))
        x = nn.relu(GraphConvolution(self.features, self.dtype)(x, adj))
        return nn.Dense(2, dtype=self.dtype)(x.reshape(x.shape[0], -1))
