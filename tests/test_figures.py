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


def _write_cluster_csv(path, n=60, orders=3, seed=0):
    rng = np.random.RandomState(seed)
    rows = []
    for _ in range(n):
        row = []
        size = rng.randint(50, 1000)
        for o in range(orders):
            row += [size * 10**o, rng.uniform(0.8, 1), rng.uniform(0.5, 1),
                    rng.uniform(0.8, 1), rng.uniform(0.5, 1), rng.uniform(0.9, 1)]
        rows.append(row)
    _write_csv(str(path), rows)


def test_render_cluster_figures(tmp_path):
    from annealing_sign_problem_tpu.figures.render import main

    csv = tmp_path / "clusters.csv"
    _write_cluster_csv(csv)
    for kind in ["overlap-pdf", "overlap-integrated",
                 "overlap-integrated-per-size", "size-pdf"]:
        out = tmp_path / f"{kind}.png"
        main([kind, str(csv), "--output", str(out)])
        assert out.exists() and out.stat().st_size > 5000


def test_render_small_systems(tmp_path):
    from annealing_sign_problem_tpu.figures.render import main

    for sysname in ["heisenberg_kagome_16", "sk_16_1"]:
        path = tmp_path / f"{sysname}.csv"
        with open(path, "w") as f:
            f.write("number_sweeps,acc_prob_mean,acc_prob_std,overlap_prob_mean,overlap_prob_std\n")
            for i, t in enumerate([100, 200, 400, 800]):
                f.write(f"{t},{0.5 + 0.1 * i},{0.02},{0.4 + 0.1 * i},{0.03}\n")
    out = tmp_path / "small.png"
    main(["small",
          "--csv", f"heisenberg_kagome_16={tmp_path}/heisenberg_kagome_16.csv",
          "--csv", f"sk_16_1={tmp_path}/sk_16_1.csv",
          "--output", str(out)])
    assert out.exists() and out.stat().st_size > 5000


def test_render_noise_and_analysis(tmp_path):
    from annealing_sign_problem_tpu.figures.render import main

    # noise tree (same layout walk_results expects)
    rng = np.random.RandomState(3)
    for noise in [0.1, 0.3, 1.0]:
        rows = [[100, 0.9, rng.uniform(0.3, 1), np.nan, np.nan,
                 np.exp(-noise)] for _ in range(40)]
        _write_csv(str(tmp_path / f"noise_{noise}" / "cutoff_1e-06" / "r.csv.1"), rows)
    out = tmp_path / "noise.png"
    main(["noise", str(tmp_path), "--output", str(out)])
    assert out.exists()

    # couplings spectrum + frustration curve
    np.savetxt(tmp_path / "couplings.csv", np.geomspace(1, 1e-6, 50))
    main(["couplings", str(tmp_path / "couplings.csv"),
          "--output", str(tmp_path / "c.png")])
    assert (tmp_path / "c.png").exists()
    np.savetxt(tmp_path / "frust.csv",
               np.vstack([np.geomspace(1e-6, 1, 20), np.linspace(0.5, 1, 20)]).T,
               delimiter=",")
    main(["frustration", str(tmp_path / "frust.csv"),
          "--output", str(tmp_path / "f.png")])
    assert (tmp_path / "f.png").exists()


def test_render_noise_stats_csv_with_header_and_nans(tmp_path):
    # postprocess_influence_of_noise emits a header line and NaN rows for
    # empty amplitude-overlap bins; the Figure-4 renderer must accept both
    from annealing_sign_problem_tpu.figures.render import main

    stats = tmp_path / "noise_stats.csv"
    with open(stats, "w") as f:
        f.write("amplitude_overlap,median,upper,lower\n")
        f.write("0.005,nan,nan,nan\n")
        f.write("0.5,0.6,0.7,0.5\n")
        f.write("0.9,0.95,0.99,0.9\n")
    out = tmp_path / "noise_stats.png"
    main(["noise", str(stats), "--output", str(out)])
    assert out.exists() and out.stat().st_size > 5000
