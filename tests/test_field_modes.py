import numpy as np
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.train.loop import test_simulated_annealing_on_patches

# not a pytest test despite the reference-parity name
test_simulated_annealing_on_patches.__test__ = False


def test_field_mode_comparison_runs():
    config = systems.get_system("heisenberg_kagome_16")
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)
    _, psi = ed.ground_state(op, num_iter=64, seed=0)
    rows = test_simulated_annealing_on_patches(
        op, psi,
        number_sweeps=200,
        number_monte_carlo_samples=400,
        number_outer_iterations=1,
        repetitions=8,
        seed=5,
    )
    assert len(rows) == 1
    for row in rows:
        assert 0.5 <= row["zero_field"] <= 1.0
        assert 0.5 <= row["exact_field"] <= 1.0
        # boundary fields should not hurt much on these patches
        assert row["exact_field"] >= row["zero_field"] - 0.1


def test_kagome_train_cli_dense_fallback(tmp_path):
    from annealing_sign_problem_tpu.experiments import kagome_train

    rc = kagome_train.main(
        [
            "--system", "heisenberg_kagome_16",
            "--mode", "supervised",
            "--output", str(tmp_path / "run"),
            "--number-samples", "1000",
            "--epochs", "30",
            "--batch-size", "128",
            "--optimizer", "adam",
            "--learning-rate", "1e-2",
        ]
    )
    assert rc == 0
