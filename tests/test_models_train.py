import numpy as np
import jax
import jax.numpy as jnp
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.models import (
    ConvSignModel,
    DenseSignModel,
    GraphSignModel,
    KagomeResidualNetwork,
    KagomeSignNetwork,
)
from annealing_sign_problem_tpu.train import (
    TrainingConfig,
    compute_metrics_on_full_space,
    find_ground_state,
    init_sign_model,
    make_optimizer,
    optimize_sign_structure,
    tune_neural_network,
    forward_logits,
)


@pytest.fixture(scope="module")
def small_system():
    config = systems.get_system("heisenberg_kagome_16")
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    energy, psi = ed.ground_state(op, num_iter=64, seed=0)
    return op, psi


def _spins_batch(n=8):
    return np.arange(1, n + 1, dtype=np.uint64) * 7


def test_dense_model_forward():
    model = DenseSignModel(number_spins=16, features=(32, 32))
    state = init_sign_model(model, _spins_batch(), make_optimizer("adam", 1e-3))
    logits = forward_logits(state, _spins_batch(16))
    assert logits.shape == (16, 2)


def test_conv_model_forward():
    model = ConvSignModel(shape=(4, 4), channels=(8, 8))
    state = init_sign_model(model, _spins_batch(), make_optimizer("adam", 1e-3))
    logits = forward_logits(state, _spins_batch(5))
    assert logits.shape == (5, 2)


def test_kagome_models_forward():
    for cls in (KagomeSignNetwork, KagomeResidualNetwork):
        model = cls(number_spins=12, channels=8)
        state = init_sign_model(model, _spins_batch(), make_optimizer("adam", 1e-3))
        logits = forward_logits(state, _spins_batch(6))
        assert logits.shape == (6, 2)


def test_graph_model_forward():
    adj = np.eye(16) + np.diag(np.ones(15), 1) + np.diag(np.ones(15), -1)
    model = GraphSignModel(number_spins=16, adjacency=adj, features=8)
    state = init_sign_model(model, _spins_batch(), make_optimizer("adam", 1e-3))
    logits = forward_logits(state, _spins_batch(4))
    assert logits.shape == (4, 2)


def test_supervised_learning_on_exact_signs(small_system):
    """The reference's supervised sanity loop (kagome_12_supervised shape,
    train.py:1405-1476): sample spins, label with exact signs (cheat=True),
    train, check full-space metrics improve."""
    op, psi = small_system
    rng = np.random.RandomState(0)
    p = psi**2
    p /= p.sum()
    idx = rng.choice(op.basis.number_states, size=2000, replace=True, p=p)
    spins = op.basis.states[idx]
    spins_u, labels, counts = optimize_sign_structure(
        spins, op, ground_state=psi, cheat=True
    )

    model = DenseSignModel(number_spins=16, features=(64,), use_batchnorm=False)
    state = init_sign_model(model, spins_u[:8], make_optimizer("adam", 1e-2))
    before = compute_metrics_on_full_space(op.basis, psi, state)
    state = tune_neural_network(
        state, spins_u, labels, weights=counts, epochs=60, batch_size=128
    )
    after = compute_metrics_on_full_space(op.basis, psi, state)
    assert after["overlap"] > before["overlap"]
    assert after["overlap"] > 0.8


def test_optimize_sign_structure_sa(small_system):
    """Non-cheat path: SA on the Ising model built from exact amplitudes
    recovers near-exact signs on the sampled subset."""
    op, psi = small_system
    from annealing_sign_problem_tpu.amplitudes import ground_state_to_log_coeff_fn

    rng = np.random.RandomState(1)
    p = psi**2
    p /= p.sum()
    idx = rng.choice(op.basis.number_states, size=500, replace=True, p=p)
    spins = op.basis.states[idx]
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    spins_u, labels, counts = optimize_sign_structure(
        spins, op, log_coeff_fn=log_fn, number_sweeps=200, repetitions=16, seed=3
    )
    exact_labels = (psi[op.basis.index(spins_u)] < 0).astype(np.int64)
    agreement = np.mean(labels == exact_labels)
    agreement = max(agreement, 1 - agreement)
    assert agreement > 0.9


def test_find_ground_state_improves(small_system):
    op, psi = small_system
    model = DenseSignModel(number_spins=16, features=(64,), use_batchnorm=False)
    state = init_sign_model(
        model, op.basis.states[:8], make_optimizer("adam", 1e-2)
    )
    config = TrainingConfig(
        number_sa_sweeps=200,
        number_supervised_epochs=40,
        number_monte_carlo_samples=1500,
        number_outer_iterations=2,
        train_batch_size=128,
        sa_repetitions=8,
        seed=7,
    )
    state = find_ground_state(op, psi, state, config)
    assert state.history[-1]["overlap"] > state.history[0]["overlap"]
    assert state.history[-1]["overlap"] > 0.7


def test_find_ground_state_resumes(small_system, tmp_path):
    """A retried run with the same output dir must skip completed
    iterations (checkpoint + cached SA dataset) and land on the SAME
    params/metrics as the uninterrupted run (identical host-rng stream)."""
    op, psi = small_system

    def fresh_state():
        model = DenseSignModel(number_spins=16, features=(32,), use_batchnorm=False)
        return init_sign_model(
            model, op.basis.states[:8], make_optimizer("adam", 1e-2), seed=11
        )

    config = TrainingConfig(
        number_sa_sweeps=100,
        number_supervised_epochs=10,
        number_monte_carlo_samples=400,
        number_outer_iterations=2,
        train_batch_size=128,
        sa_repetitions=4,
        seed=21,
        output=str(tmp_path),
    )
    state1 = find_ground_state(op, psi, fresh_state(), config)
    assert (tmp_path / "sa_dataset_1.h5").exists()
    assert (tmp_path / "model_2").is_dir()

    # simulate the retry: fresh process state, same output dir
    state2 = find_ground_state(op, psi, fresh_state(), config)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert state1.history[-1] == state2.history[-1]

    # partial resume: only iteration 1 done -> iteration 2 re-runs from the
    # cached dataset and reproduces the same final params
    import shutil

    shutil.rmtree(tmp_path / "model_2")
    state3 = find_ground_state(op, psi, fresh_state(), config)
    for a, b in zip(
        jax.tree_util.tree_leaves(state1.params),
        jax.tree_util.tree_leaves(state3.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
