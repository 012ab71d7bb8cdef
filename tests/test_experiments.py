"""Experiment-harness tests: tiny versions of every CLI run end-to-end on
the CPU mesh (the reference has no automated tests at all — SURVEY §4)."""

import os

import numpy as np
import pytest

from annealing_sign_problem_tpu.experiments import analysis, full_hilbert_space
from annealing_sign_problem_tpu.experiments import generate_systems, sampled_connected_components
from annealing_sign_problem_tpu.figures import (
    estimate_overlap_integrated,
    load_cluster_csv,
    process_results,
)


# small dedicated system so CLI tests stay fast: 10-spin Heisenberg ring
RING_YAML = """\
basis:
  number_spins: 10
  hamming_weight: 5
hamiltonian:
  name: ring
  terms:
    - matrix: [[1, 0, 0, 0], [0, -1, 2, 0], [0, 2, -1, 0], [0, 0, 0, 1]]
      sites: [[0,1],[1,2],[2,3],[3,4],[4,5],[5,6],[6,7],[7,8],[8,9],[9,0]]
"""


@pytest.fixture()
def ring_yaml(tmp_path):
    path = tmp_path / "ring10.yaml"
    path.write_text(RING_YAML)
    return str(path)


def test_full_hilbert_space_cli(ring_yaml, tmp_path):
    out = str(tmp_path / "ring.csv")
    rc = full_hilbert_space.main(
        [
            "--yaml", ring_yaml,
            "--output", out,
            "--number-sweeps", "50,100",
            "--repetitions", "16",
            "--trials", "2",
            "--seed", "3",
        ]
    )
    assert rc == 0
    table = np.loadtxt(out, delimiter=",", skiprows=1)
    assert table.shape == (2, 16)
    # frustration-free ring: SA converges fast; residual probability high
    assert table[1, 1] >= table[0, 1] - 0.2  # acc prob roughly monotone


def test_full_hilbert_space_refuses_overwrite(ring_yaml, tmp_path):
    out = str(tmp_path / "exists.csv")
    open(out, "w").close()
    rc = full_hilbert_space.main(
        ["--yaml", ring_yaml, "--output", out, "--number-sweeps", "10"]
    )
    assert rc == 1


def test_quality_cli(ring_yaml, capsys):
    rc = analysis.check_greedy_algorithm_quality(["--yaml", ring_yaml])
    assert rc == 0
    accuracy, overlap = map(float, capsys.readouterr().out.strip().split(","))
    # the Heisenberg ring obeys Marshall sign rule -> greedy solves exactly
    assert overlap > 0.99


def test_noise_cli(ring_yaml, tmp_path):
    out = str(tmp_path / "noise.csv")
    rc = analysis.analyze_influence_of_noise(
        [
            "--yaml", ring_yaml, "--output", out, "--seed", "1",
            "--steps", "3", "--repetitions", "2",
        ]
    )
    assert rc == 0
    table = np.loadtxt(out, delimiter=",")
    assert table.shape == (6, 3)
    stats = analysis.postprocess_influence_of_noise(out)
    assert os.path.exists(stats)


def test_couplings_and_frustration_cli(ring_yaml, tmp_path):
    out1 = str(tmp_path / "couplings.csv")
    assert analysis.analyze_coupling_distribution(["--yaml", ring_yaml, "--output", out1]) == 0
    couplings = np.loadtxt(out1)
    assert np.all(np.diff(couplings) <= 1e-15)  # sorted descending

    out2 = str(tmp_path / "frustration.csv")
    assert analysis.analyze_probability_of_frustration(
        ["--yaml", ring_yaml, "--output", out2]
    ) == 0
    assert os.path.exists(out2)


def test_amplitude_overlap_cli(ring_yaml, capsys):
    assert analysis.analyze_smallest_amplitude_overlap(
        ["--yaml", ring_yaml, "--trials", "10"]
    ) == 0
    assert len(capsys.readouterr().out.strip().split(",")) == 3


def test_sampled_connected_components_cli(ring_yaml, tmp_path):
    out = str(tmp_path / "clusters.csv")
    rc = sampled_connected_components.main(
        [
            "--yaml", ring_yaml,
            "--output", out,
            "--order", "1",
            "--number-samples", "3",
            "--min-cluster-size", "5",
            "--max-cluster-size", "10",
            "--number-sweeps", "50",
            "--repetitions", "8",
            "--seed", "4",
        ]
    )
    assert rc == 0
    data = load_cluster_csv(out)
    assert data.shape == (3, 2, 6)  # 3 clusters x (order 0, 1) x 6 columns
    # order-1 clusters are extensions: never smaller
    assert np.all(data[:, 1, 0] >= data[:, 0, 0])
    # figures pipeline consumes the CSV
    r = process_results(out, order=0)
    assert 0.0 <= r["median_overlap"] <= 1.0


def test_sampled_connected_components_workers(ring_yaml, tmp_path):
    outs = []
    for w in range(2):
        out = str(tmp_path / "part.csv")
        rc = sampled_connected_components.main(
            [
                "--yaml", ring_yaml, "--output", out,
                "--order", "0", "--number-samples", "4",
                "--min-cluster-size", "4", "--max-cluster-size", "8",
                "--no-annealing", "--seed", "9",
                "--num-workers", "2", "--worker-id", str(w),
            ]
        )
        assert rc == 0
        outs.append(out + f".{w}")
    data = load_cluster_csv(outs)
    assert data.shape[0] == 4  # all items covered across workers


def test_generate_systems(tmp_path):
    rc = generate_systems.main(
        ["--output-dir", str(tmp_path), "--systems", "sk_16_1,heisenberg_kagome_16"]
    )
    assert rc == 0
    from annealing_sign_problem_tpu.io import load_hamiltonian

    op = load_hamiltonian(str(tmp_path / "sk_16_1.yaml"))
    assert op.number_pairs == 120


def test_overlap_integrated():
    grid, p = estimate_overlap_integrated(np.array([0.5, 0.9, 1.0, 1.0]))
    assert p[0] == 1.0
    assert p[-1] == 0.5


def test_ed_runner_cli(ring_yaml, tmp_path):
    from annealing_sign_problem_tpu.experiments import ed_runner
    from annealing_sign_problem_tpu.io import load_ground_state

    out = str(tmp_path / "ring.h5")
    rc = ed_runner.main(["--yaml", ring_yaml, "--output", out, "--num-iter", "64"])
    assert rc == 0
    psi, energy, reps = load_ground_state(out)
    assert len(reps) == 252  # C(10, 5)
    assert energy < 0


def test_sampled_connected_components_resume(ring_yaml, tmp_path):
    """--resume continues an interrupted batch exactly: a 2-cluster run
    followed by a resumed 4-cluster run reproduces the one-shot 4-cluster
    batch row for row (the scatter is deterministic in --seed)."""
    common = [
        "--yaml", ring_yaml, "--order", "0", "--min-cluster-size", "4",
        "--max-cluster-size", "8", "--no-annealing", "--seed", "21",
    ]
    full = str(tmp_path / "full.csv")
    rc = sampled_connected_components.main(
        common + ["--output", full, "--number-samples", "4"]
    )
    assert rc == 0

    part = str(tmp_path / "part.csv")
    rc = sampled_connected_components.main(
        common + ["--output", part, "--number-samples", "2"]
    )
    assert rc == 0
    rc = sampled_connected_components.main(
        common + ["--output", part, "--number-samples", "4", "--resume"]
    )
    assert rc == 0

    rows = lambda p: [
        ln for ln in open(p) if ln.strip() and not ln.startswith("#")
    ]
    assert rows(part) == rows(full)
    # without --resume the driver still refuses to overwrite
    rc = sampled_connected_components.main(
        common + ["--output", part, "--number-samples", "4"]
    )
    assert rc == 1


def test_count_completed_rows_repairs_truncated_line(tmp_path):
    """A run killed mid-row-write leaves a partial trailing line; resume
    must drop it (so the cluster re-runs) rather than count it done."""
    from annealing_sign_problem_tpu.experiments.sampled_connected_components import (
        count_completed_rows,
    )

    p = tmp_path / "cell.csv"
    p.write_text("# provenance\n1,2,3\n4,5,6\n7,8")  # no trailing newline
    assert count_completed_rows(str(p)) == 2
    assert p.read_text() == "# provenance\n1,2,3\n4,5,6\n"  # repaired
    # intact files are untouched
    p2 = tmp_path / "ok.csv"
    p2.write_text("# h\n1,2,3\n")
    assert count_completed_rows(str(p2)) == 1
    assert p2.read_text() == "# h\n1,2,3\n"


def test_train_resume_fingerprint(tmp_path):
    """Resuming into an output dir whose caches were built under a
    different config must be refused (ADVICE r4)."""
    import pytest as _pytest

    from annealing_sign_problem_tpu.train.loop import (
        TrainingConfig,
        _check_resume_fingerprint,
    )

    cfg = TrainingConfig(output=str(tmp_path / "run"), seed=7,
                         number_sa_sweeps=100)
    _check_resume_fingerprint(cfg)          # first run: writes fingerprint
    _check_resume_fingerprint(cfg)          # same config: resume allowed
    bad = TrainingConfig(output=cfg.output, seed=8, number_sa_sweeps=100)
    with _pytest.raises(RuntimeError, match="refusing to resume"):
        _check_resume_fingerprint(bad)
