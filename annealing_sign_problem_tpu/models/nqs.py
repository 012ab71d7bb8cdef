"""Neural-quantum-state amplitude networks and symmetrisation.

Re-design of the reference's pyrochlore NQS baseline nets
(astrakhantsev_2021.py:19-254, from PRX 11, 041021): a dense and a 3-D
convolutional log-amplitude network over the 32-site pyrochlore cell, a
stable ``logmeanexp``, symmetrisation over lattice translations (the
2x2x2 translation images, astrakhantsev_2021.py:210-254), combination of
amplitude and sign networks into one complex log-psi, and projection of
phases to the nearest multiple of pi (astrakhantsev_2021.py:494-508).

The reference loads pretrained torch checkpoints; here the architectures
are native flax modules that can be trained in-framework or initialised
from converted weights.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .. import bits as _bits

__all__ = [
    "logmeanexp",
    "LogAmplitudeMLP",
    "LogAmplitudeConv3D",
    "symmetrize_log_amplitude",
    "combine_amplitude_and_sign",
    "project_to_real",
    "pretrain_amplitude",
    "pyrochlore_translations",
]


def logmeanexp(x: jax.Array, axis=None) -> jax.Array:
    """Numerically stable log(mean(exp(x))) (astrakhantsev_2021.py:46-77)."""
    n = x.shape[axis] if axis is not None else x.size
    return jax.scipy.special.logsumexp(x, axis=axis) - jnp.log(n)


class LogAmplitudeMLP(nn.Module):
    """Dense log-amplitude network: unpack -> MLP -> scalar log|psi|."""

    number_spins: int
    features: Sequence[int] = (64, 64)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spins):
        x = _bits.unpack(spins, self.number_spins, dtype=self.dtype)
        for f in self.features:
            x = nn.relu(nn.Dense(f, dtype=self.dtype)(x))
        return nn.Dense(1, dtype=self.dtype)(x)[..., 0]


class LogAmplitudeConv3D(nn.Module):
    """Periodic 3-D CNN log-amplitude network for the 2x2x2x4 pyrochlore
    cell (astrakhantsev_2021.py's CNN variant): sites laid out as a
    (2, 2, 2, 4) tensor (cell x sublattice-channel)."""

    channels: Sequence[int] = (16, 16)
    kernel: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spins):
        x = _bits.unpack(spins, 32, dtype=self.dtype)
        x = x.reshape(x.shape[0], 2, 2, 2, 4)
        for c in self.channels:
            x = nn.Conv(
                c, (self.kernel,) * 3, padding="CIRCULAR", dtype=self.dtype
            )(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, dtype=self.dtype)(x)[..., 0]


def pyrochlore_translations() -> np.ndarray:
    """The eight 2x2x2 cell-translation site permutations of the 32-site
    pyrochlore cluster (site = cell(x,y,z) x sublattice layout above)."""
    def site(x, y, z, s):
        return ((x % 2) * 4 + (y % 2) * 2 + (z % 2)) * 4 + s

    perms = []
    for dx in range(2):
        for dy in range(2):
            for dz in range(2):
                p = np.zeros(32, dtype=np.int32)
                for x in range(2):
                    for y in range(2):
                        for z in range(2):
                            for s in range(4):
                                p[site(x, y, z, s)] = site(x + dx, y + dy, z + dz, s)
                perms.append(p)
    return np.stack(perms)


def symmetrize_log_amplitude(
    log_amp_fn: Callable, permutations: np.ndarray, number_spins: int
) -> Callable:
    """log psi_sym(s) = logmeanexp_g log psi(g s) — amplitude symmetrisation
    over a permutation set (astrakhantsev_2021.py:210-254)."""
    perms = np.asarray(permutations)
    # precompute shift tables: image = sum_i bit_i << perm[i]
    shift_table = jnp.asarray(np.uint64(1) << perms.astype(np.uint64))  # (G, n)
    shifts = jnp.arange(number_spins, dtype=jnp.uint64)

    def fn(spins: jax.Array) -> jax.Array:
        spins = jnp.asarray(spins, dtype=jnp.uint64)
        bit = ((spins[..., None] >> shifts) & jnp.uint64(1)).astype(jnp.uint64)
        images = jnp.sum(bit[..., None, :] * shift_table, axis=-1)  # (..., G)
        flat = images.reshape(-1)
        la = log_amp_fn(flat).reshape(images.shape)
        return logmeanexp(2.0 * la, axis=-1) / 2.0  # mean of psi^2 images

    return fn


def combine_amplitude_and_sign(
    log_amp_fn: Callable, sign_logits_fn: Callable
) -> Callable:
    """Complex log psi from an amplitude net and a 2-class sign net:
    log psi = log|psi| + i*pi*argmax(sign logits) (train.py:353-373)."""

    def fn(spins: jax.Array) -> jax.Array:
        a = log_amp_fn(spins)
        b = jnp.pi * jnp.argmax(sign_logits_fn(spins), axis=-1)
        return a + 1j * b.astype(jnp.float64)

    return fn


def project_to_real(log_psi: jax.Array) -> jax.Array:
    """Round the phase to the nearest multiple of pi — forces a real
    wavefunction (astrakhantsev_2021.py:494-508)."""
    phase = jnp.imag(log_psi)
    rounded = jnp.pi * jnp.round(phase / jnp.pi)
    return jnp.real(log_psi) + 1j * rounded


def pretrain_amplitude(
    model: nn.Module,
    states: np.ndarray,  # (N,) uint64 basis states
    log_amps: np.ndarray,  # (N,) target log|psi|
    weights: Optional[np.ndarray] = None,  # default |psi|^2
    steps: int = 2000,
    batch_size: int = 1024,
    learning_rate: float = 1e-3,
    seed: int = 0,
):
    """Fit a log-amplitude network to target amplitudes (weighted MSE).

    The in-framework replacement for the reference's pretrained PRX
    checkpoints (astrakhantsev_2021.py:260-285 loads torch weights from
    disk): the amplitude oracle the NQS baseline samples from becomes a
    trained network instead of an external artifact. Targets are gauge-
    shifted to zero weighted mean (log psi is defined up to a constant).
    Returns (params, final_loss).
    """
    import optax

    states = np.asarray(states, dtype=np.uint64)
    log_amps = np.asarray(log_amps, dtype=np.float64)
    if weights is None:
        weights = np.exp(2.0 * (log_amps - log_amps.max()))
    weights = np.asarray(weights, dtype=np.float64)
    weights = weights / weights.sum()
    shift = float(np.sum(weights * log_amps))
    targets = (log_amps - shift).astype(np.float32)

    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.asarray(states[:2]))
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    d_states = jnp.asarray(states)
    d_targets = jnp.asarray(targets)
    d_weights = jnp.asarray(weights, dtype=jnp.float32)

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.choice(
            key, d_states.shape[0], (batch_size,), p=d_weights
        )
        s, t = d_states[idx], d_targets[idx]

        def loss_fn(p):
            pred = model.apply(p, s)
            return jnp.mean((pred - t) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = jnp.inf
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
    return params, float(loss)
