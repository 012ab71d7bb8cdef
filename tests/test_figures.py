import os

import numpy as np

from annealing_sign_problem_tpu.figures import (
    estimate_overlap_pdf,
    estimate_size_pdf,
    process_noisy_results,
    walk_results,
)


def _write_csv(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("# header\n")
        for r in rows:
            f.write(",".join(f"{v:.6e}" for v in r) + "\n")


def test_walk_and_percentiles(tmp_path):
    rng = np.random.RandomState(0)
    for noise, cutoff in [(0.0, 1e-6), (0.5, 1e-6)]:
        rows = []
        for _ in range(30):
            overlap = rng.uniform(0.6, 1.0)
            rows.append([100, 0.9, overlap, np.nan, np.nan, 0.95])
        _write_csv(
            str(tmp_path / f"noise_{noise}" / f"cutoff_{cutoff}" / "run.csv.1"),
            rows,
        )
    found = walk_results(str(tmp_path))
    assert len(found) == 2
    table = process_noisy_results(str(tmp_path), order=0)
    assert table.shape == (2, 6)
    assert np.all(table[:, 2] <= table[:, 3])  # p25 <= p50
    assert np.all(table[:, 3] <= table[:, 4])  # p50 <= p75


def test_density_estimators_nondegenerate():
    rng = np.random.RandomState(1)
    overlaps = rng.uniform(0.5, 1.0, 500)
    grid, pdf = estimate_overlap_pdf(overlaps)
    assert pdf.shape == grid.shape
    assert np.trapezoid(pdf, grid) > 0.5
    sizes = rng.randint(50, 1000, 500)
    grid, spdf = estimate_size_pdf(sizes.astype(float))
    assert np.all(np.isfinite(spdf))
