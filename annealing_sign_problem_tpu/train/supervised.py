"""Supervised sign-classifier training (optax).

Mirrors the contract of the reference trainer (``tune_neural_network``,
train.py:55-126): weighted cross-entropy over (spins, target sign class,
weight) triples, minibatch SGD/Adam with optional LR schedule, early stop
when the loss crosses 1e-3, periodic epoch callbacks. The whole epoch runs
as one jitted ``lax.scan`` over shuffled minibatches — no Python-level
batch loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.log import logger

__all__ = [
    "SignModelState",
    "init_sign_model",
    "make_optimizer",
    "tune_neural_network",
    "forward_logits",
]


@dataclasses.dataclass
class SignModelState:
    """Model + parameters + optimiser state (flax variables split into
    params and batch_stats)."""

    apply_fn: Callable
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def init_sign_model(model, example_spins, tx: optax.GradientTransformation, seed: int = 0):
    variables = model.init(jax.random.PRNGKey(seed), jnp.asarray(example_spins))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return SignModelState(
        apply_fn=model.apply,
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )


def make_optimizer(name: str = "adam", learning_rate: float = 1e-3, **kwargs):
    if name == "adam":
        return optax.adam(learning_rate, **kwargs)
    if name == "sgd":
        return optax.sgd(learning_rate, **kwargs)
    if name == "adamw":
        return optax.adamw(learning_rate, **kwargs)
    raise ValueError(f"unknown optimizer: {name}")


def _loss_fn(apply_fn, params, batch_stats, spins, labels, weights, train: bool):
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    kwargs = {}
    if batch_stats is not None and train:
        logits, updates = apply_fn(
            variables, spins, train=True, mutable=["batch_stats"]
        )
        new_stats = updates["batch_stats"]
    else:
        logits = apply_fn(variables, spins, train=False)
        new_stats = batch_stats
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss = jnp.dot(ce, weights)
    accuracy = jnp.dot((jnp.argmax(logits, axis=1) == labels).astype(ce.dtype), weights)
    return loss, (accuracy, new_stats)


def tune_neural_network(
    state: SignModelState,
    spins: np.ndarray,
    target_labels: np.ndarray,
    weights: Optional[np.ndarray] = None,
    epochs: int = 100,
    batch_size: int = 256,
    seed: int = 0,
    early_stop_loss: float = 1e-3,
    on_epoch_end=None,
) -> SignModelState:
    """Train in place; returns the updated state.

    ``target_labels``: 0 for positive sign, 1 for negative (the argmax
    convention of the reference's sign networks, train.py:365).
    """
    n = spins.shape[0]
    spins = jnp.asarray(np.asarray(spins, dtype=np.uint64))
    labels = jnp.asarray(np.asarray(target_labels, dtype=np.int32))
    # Reference semantics (supervised_loop_once / compute_average_loss,
    # square_4x4.py:77-118, shared by train.py): weights are RE-NORMALISED
    # PER BATCH (w_b / sum(w_b)), so every step's loss is a weighted MEAN
    # over the batch and the gradient scale is O(1) regardless of the
    # dataset size or the weights' global normalisation. Anything else
    # breaks at scale: normalising over the full set shrinks gradients by
    # n/batch_size (frozen training at kagome-36's n ~ 2e4), raw ones
    # inflate them by batch_size (divergence to a constant predictor at
    # the reference's lr). Only the RELATIVE weights matter here.
    if weights is None:
        w = np.ones(n)
    else:
        w = np.asarray(weights, dtype=np.float64)
    w = jnp.asarray(w, dtype=jnp.float32)

    num_batches = max(n // batch_size, 1)
    apply_fn, tx = state.apply_fn, state.tx
    has_stats = state.batch_stats is not None

    @jax.jit
    def train_epoch(params, batch_stats, opt_state, key):
        perm = jax.random.permutation(key, n)[: num_batches * batch_size]
        perm = perm.reshape(num_batches, batch_size)

        def step(carry, idx):
            params, batch_stats, opt_state = carry
            bspins, blabels, bw = spins[idx], labels[idx], w[idx]
            bw = bw / jnp.sum(bw)  # per-batch renormalisation (see above)
            (loss, (acc, new_stats)), grads = jax.value_and_grad(
                lambda p: _loss_fn(apply_fn, p, batch_stats, bspins, blabels, bw, True),
                has_aux=True,
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            step, (params, batch_stats, opt_state), perm
        )
        return params, batch_stats, opt_state, jnp.mean(losses)

    w_eval = w / jnp.sum(w)

    @jax.jit
    def eval_all(params, batch_stats):
        loss, (acc, _) = _loss_fn(
            apply_fn, params, batch_stats, spins, labels, w_eval, False
        )
        return loss, acc

    key = jax.random.PRNGKey(seed)
    loss, acc = eval_all(state.params, state.batch_stats)
    if on_epoch_end is not None:
        on_epoch_end(0, epochs, float(loss), float(acc))

    # fresh optimiser state per call, like the reference's per-call torch
    # optimizer construction (train.py:88-99) — also what makes the outer
    # loop's checkpoint-resume exact (moments need not be checkpointed)
    params, batch_stats, opt_state = state.params, state.batch_stats, tx.init(state.params)
    for epoch in range(epochs):
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_epoch(
            params, batch_stats, opt_state, sub
        )
        loss = float(loss)
        if loss < early_stop_loss:
            logger.info("Stopping early because loss is low enough...")
            break
        if on_epoch_end is not None and (epoch + 1) % 10 == 0:
            eloss, eacc = eval_all(params, batch_stats)
            on_epoch_end(epoch + 1, epochs, float(eloss), float(eacc))

    state.params, state.batch_stats, state.opt_state = params, batch_stats, opt_state
    loss, acc = eval_all(params, batch_stats)
    if on_epoch_end is not None:
        on_epoch_end(epochs, epochs, float(loss), float(acc))
    return state


def forward_logits(
    state: SignModelState, spins: np.ndarray, batch_size: int = 16384
) -> np.ndarray:
    """Batched inference over packed spins -> (N, 2) logits (the
    reference's ``forward_with_batches``, train.py:492)."""
    spins = np.asarray(spins, dtype=np.uint64)
    n = spins.shape[0]

    @jax.jit
    def fwd(chunk):
        return state.apply_fn(state.variables(), chunk, train=False)

    outs = []
    pad = (-n) % batch_size if n > batch_size else 0
    padded = np.concatenate([spins, np.zeros(pad, dtype=np.uint64)]) if pad else spins
    step = batch_size if n >= batch_size else n
    for s in range(0, len(padded), step):
        outs.append(np.asarray(fwd(jnp.asarray(padded[s : s + step]))))
    out = np.concatenate(outs)[:n]
    return out
