"""Post-processing of cluster-run CSVs into density/percentile tables.

The aggregation stage that turns the large-system cluster CSVs into the
paper's overlap/size density figures (reference: figures/density.py —
KDE of the overlap distribution :24-35, integrated P(overlap >= b) curves
:38-45, log10-size densities :48-55, noise/cutoff directory walking
:70-87, percentile tables :89-159). Works on the output of
``experiments.sampled_connected_components`` (same CSV schema).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, List, Optional, Tuple

import numpy as np
from scipy import stats

__all__ = [
    "load_cluster_csv",
    "estimate_overlap_pdf",
    "estimate_overlap_integrated",
    "estimate_size_pdf",
    "walk_results",
    "process_results",
    "process_noisy_results",
]

_COLUMNS = [
    "size",
    "greedy_accuracy",
    "greedy_overlap",
    "sa_accuracy",
    "sa_overlap",
    "amplitude_overlap",
]


def load_cluster_csv(paths) -> np.ndarray:
    """Concatenate cluster CSVs -> (rows, orders, 6) array. Rows hold one
    cluster; the flat 6*(order+1) columns are reshaped per extension
    order."""
    if isinstance(paths, str):
        paths = [paths]
    tables = []
    for p in paths:
        t = np.loadtxt(p, delimiter=",", comments="#", ndmin=2)
        if t.size:
            tables.append(t)
    if not tables:
        return np.zeros((0, 0, 6))
    table = np.concatenate(tables)
    orders = table.shape[1] // 6
    return table.reshape(table.shape[0], orders, 6)


def _kde_or_histogram(values: np.ndarray, grid: np.ndarray, bw_method=None) -> np.ndarray:
    """Gaussian KDE with a histogram fallback for degenerate samples (all
    clusters solved perfectly -> zero variance)."""
    try:
        return stats.gaussian_kde(values, bw_method=bw_method)(grid)
    except (ValueError, np.linalg.LinAlgError):
        edges = np.concatenate([grid, [2 * grid[-1] - grid[-2]]])
        counts, _ = np.histogram(values, bins=edges, density=True)
        return counts


def estimate_overlap_pdf(
    overlaps: np.ndarray, grid: Optional[np.ndarray] = None, bw_method=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Gaussian-KDE density of sign overlaps on [0, 1]."""
    if grid is None:
        grid = np.linspace(0.0, 1.0, 201)
    overlaps = overlaps[np.isfinite(overlaps)]
    return grid, _kde_or_histogram(overlaps, grid, bw_method)


def estimate_overlap_integrated(
    overlaps: np.ndarray, grid: Optional[np.ndarray] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """P(overlap >= b) curve."""
    if grid is None:
        grid = np.linspace(0.0, 1.0, 201)
    overlaps = overlaps[np.isfinite(overlaps)]
    p = np.array([np.mean(overlaps >= b) for b in grid])
    return grid, p


def estimate_size_pdf(
    sizes: np.ndarray, grid: Optional[np.ndarray] = None, bw_method=None
) -> Tuple[np.ndarray, np.ndarray]:
    """Density of log10(cluster size)."""
    log_sizes = np.log10(sizes[sizes > 0])
    if grid is None:
        grid = np.linspace(0.0, max(7.0, log_sizes.max()), 201)
    return grid, _kde_or_histogram(log_sizes, grid, bw_method)


def walk_results(root: str) -> Dict[Tuple[float, float], List[str]]:
    """Collect CSV files under noise_<eps>/cutoff_<c>/ directories (the
    reference's JOBID-suffixed layout, figures/density.py:70-87)."""
    out: Dict[Tuple[float, float], List[str]] = {}
    pattern = re.compile(r"noise_([0-9.eE+-]+)[/\\]cutoff_([0-9.eE+-]+)")
    for path in glob.glob(os.path.join(root, "**", "*.csv*"), recursive=True):
        m = pattern.search(path)
        if m is None:
            continue
        key = (float(m.group(1)), float(m.group(2)))
        out.setdefault(key, []).append(path)
    return out


def process_results(paths, order: int = -1) -> Dict[str, np.ndarray]:
    """Overlap/size density tables for one (noise, cutoff) setting."""
    data = load_cluster_csv(paths)
    if data.size == 0:
        return {}
    overlaps = data[:, order, _COLUMNS.index("greedy_overlap")]
    sizes = data[:, order, _COLUMNS.index("size")]
    x_pdf, pdf = estimate_overlap_pdf(overlaps)
    x_int, integrated = estimate_overlap_integrated(overlaps)
    x_size, size_pdf = estimate_size_pdf(sizes)
    return {
        "overlap_grid": x_pdf,
        "overlap_pdf": pdf,
        "overlap_integrated": integrated,
        "size_grid": x_size,
        "size_pdf": size_pdf,
        "median_overlap": np.nanmedian(overlaps),
    }


def process_noisy_results(root: str, order: int = -1) -> np.ndarray:
    """Percentile table over the noise sweep: rows
    (noise, cutoff, p25, p50, p75, mean_amplitude_overlap)."""
    rows = []
    for (noise, cutoff), paths in sorted(walk_results(root).items()):
        data = load_cluster_csv(paths)
        if data.size == 0:
            continue
        overlaps = data[:, order, _COLUMNS.index("greedy_overlap")]
        amp = data[:, order, _COLUMNS.index("amplitude_overlap")]
        p25, p50, p75 = np.nanpercentile(overlaps, [25, 50, 75])
        rows.append([noise, cutoff, p25, p50, p75, np.nanmean(amp)])
    return np.asarray(rows)
