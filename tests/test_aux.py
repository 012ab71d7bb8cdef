"""Auxiliary subsystems: graph view, strongest couplings, reltol extension,
fixtures, metrics writer, dataset cache, checkpoints, square-lattice CLI."""

import json
import os

import numpy as np
import pytest

from annealing_sign_problem_tpu import ed, systems
from annealing_sign_problem_tpu.amplitudes import ground_state_to_log_coeff_fn
from annealing_sign_problem_tpu.basis import SpinBasis
from annealing_sign_problem_tpu.graph import AlmostInfiniteGraph
from annealing_sign_problem_tpu.ising import (
    get_strongest_off_diag,
    make_hamiltonian_extension_reltol,
    make_ising_model,
)
from annealing_sign_problem_tpu.operator import Operator, TermGroup
from annealing_sign_problem_tpu.utils.metrics_writer import MetricsWriter


@pytest.fixture(scope="module")
def ring8():
    bonds = [[i, (i + 1) % 8] for i in range(8)]
    basis = SpinBasis(number_spins=8, hamming_weight=4).build()
    op = Operator(
        basis, [TermGroup(np.array(systems.heisenberg_matrix()), np.array(bonds))]
    )
    energy, psi = ed.ground_state(op, num_iter=64, seed=3)
    return op, energy, psi


def test_almost_infinite_graph(ring8):
    op, _, psi = ring8
    graph = AlmostInfiniteGraph(op, psi)
    s = int(op.basis.states[10])
    nbrs = graph.neighbours(s)
    assert len(nbrs) > 0
    weights = [abs(w) for _, w in nbrs]
    assert weights == sorted(weights, reverse=True)
    # edge weight = |psi_s| * c * |psi_s'| for some H-connected s'
    s2, w = nbrs[0]
    xs, cs = op.apply(np.uint64(s))
    c = dict(zip(xs.tolist(), cs.tolist()))[s2]
    i1 = op.basis.index(np.array([s], dtype=np.uint64))[0]
    i2 = op.basis.index(np.array([s2], dtype=np.uint64))[0]
    assert w == pytest.approx(abs(psi[i1]) * c * abs(psi[i2]))


def test_get_strongest_off_diag(ring8):
    op, _, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states[:30], op, log_psi_fn=log_fn)
    strongest = get_strongest_off_diag(model.ising_hamiltonian.exchange)
    dense = model.ising_hamiltonian.exchange.toarray()
    np.fill_diagonal(dense, 0.0)
    np.testing.assert_allclose(strongest, np.abs(dense).max(axis=1))


def test_reltol_extension_bounded(ring8):
    op, _, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states[:10], op, log_psi_fn=log_fn)
    loose = make_hamiltonian_extension_reltol(model, log_fn, reltol=1e-6)
    tight = make_hamiltonian_extension_reltol(model, log_fn, reltol=1e6)
    assert len(tight) <= len(loose)
    assert np.all(np.isin(model.spins, loose))
    np.testing.assert_array_equal(tight, model.spins)  # nothing passes


def test_make_test_case_cli(ring8, tmp_path):
    from annealing_sign_problem_tpu.experiments.make_test_case import make_test_case
    from annealing_sign_problem_tpu.ising import load_ising_model_from_hdf5

    op, energy, psi = ring8
    path = str(tmp_path / "fixture.h5")
    make_test_case(op, psi, path)
    h, signs, e = load_ising_model_from_hdf5(path)
    assert e == pytest.approx(energy, abs=1e-8)
    assert h.energy(signs) == pytest.approx(energy, abs=1e-8)


def test_metrics_writer(tmp_path):
    with MetricsWriter(str(tmp_path), use_tensorboard=False) as w:
        w.scalar("loss", 0.5, 0)
        w.scalars({"a": 1.0, "b": 2.0}, 1)
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 3
    assert lines[0]["tag"] == "loss"


def test_cached_sa_dataset(tmp_path):
    from annealing_sign_problem_tpu.train.loop import cached_sa_dataset

    calls = []

    def builder():
        calls.append(1)
        return (
            np.arange(5, dtype=np.uint64),
            np.zeros(5, dtype=np.int64),
            np.ones(5, dtype=np.int64),
        )

    path = str(tmp_path / "ds.h5")
    a1 = cached_sa_dataset(path, builder)
    a2 = cached_sa_dataset(path, builder)
    assert len(calls) == 1
    np.testing.assert_array_equal(a1[0], a2[0])


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from annealing_sign_problem_tpu.models import DenseSignModel
    from annealing_sign_problem_tpu.train import init_sign_model, make_optimizer
    from annealing_sign_problem_tpu.train.loop import load_checkpoint, save_checkpoint

    model = DenseSignModel(number_spins=8, features=(8,), use_batchnorm=False)
    spins = np.arange(4, dtype=np.uint64)
    state = init_sign_model(model, spins, make_optimizer("adam", 1e-3), seed=0)
    save_checkpoint(state, str(tmp_path), 1)
    state2 = init_sign_model(model, spins, make_optimizer("adam", 1e-3), seed=99)
    state2 = load_checkpoint(state2, str(tmp_path), 1)
    t1 = jax.tree_util.tree_leaves(state.params)
    t2 = jax.tree_util.tree_leaves(state2.params)
    for a, b in zip(t1, t2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_square_lattice_cli(tmp_path, monkeypatch):
    from annealing_sign_problem_tpu.experiments import square_lattice

    out = str(tmp_path / "run")
    rc = square_lattice.main(
        [
            "--system", "j1j2_square_4x4",
            "--output", out,
            "--model", "dense",
            "--channels", "16",
            "--number-outer-iterations", "1",
            "--number-sa-sweeps", "100",
            "--number-supervised-epochs", "10",
            "--number-monte-carlo-samples", "500",
            "--dump-traces",
            "--seed", "1",
        ]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out, "energy.txt"))
    assert os.path.exists(os.path.join(out, "overlap.txt"))
    assert os.path.exists(os.path.join(out, "best.out"))
    best = np.loadtxt(os.path.join(out, "best.out"))
    assert np.all(np.diff(best) <= 1e-9)  # best-energy trace non-increasing


def test_cluster_statistics(ring8):
    from annealing_sign_problem_tpu.metrics import cluster_statistics

    op, _, psi = ring8
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(op.basis.states, op, log_psi_fn=log_fn)
    stats = cluster_statistics(model)
    assert stats["spins"] == op.basis.number_states
    assert stats["bonds"] > 0
    # the Heisenberg ring is Marshall-sign-rule solvable: with exact signs
    # no bond is frustrated
    assert stats["frustrated"] == 0.0
    assert stats["largest_frustrated"] == 0.0


def test_coupling_distribution(ring8):
    from annealing_sign_problem_tpu.metrics import compute_distribution_of_couplings

    op, _, psi = ring8
    hist = compute_distribution_of_couplings(op.basis.states[:50], op, psi)
    assert hist.shape == (1000,)
    nz = hist[hist > 0]
    # rank-ordered means are non-increasing
    assert np.all(np.diff(nz) <= 1e-12)


def test_metric_variants_raw_restricted_pinned():
    """VERDICT r2 item 6: the three accuracy semantics are distinct and
    behave as documented on a model with uninformative (isolated) spins."""
    import numpy as np
    import scipy.sparse

    from annealing_sign_problem_tpu import bits
    from annealing_sign_problem_tpu.ising import IsingHamiltonian
    from annealing_sign_problem_tpu.metrics import compute_accuracy_and_overlap
    from annealing_sign_problem_tpu.solvers.sa import (
        pin_uninformative_signs,
        uninformative_spins,
    )

    # 8 coupled spins in a chain + 4 isolated (zero-amplitude) spins
    n, iso = 12, 4
    rows = np.arange(n - iso - 1)
    cols = rows + 1
    vals = -np.ones(n - iso - 1)
    m = scipy.sparse.coo_matrix((vals, (rows, cols)), shape=(n, n))
    h = IsingHamiltonian((0.5 * (m + m.T)).tocsr(), np.zeros(n))

    mask = uninformative_spins(h)
    assert mask.sum() == iso and mask[-iso:].all()

    exact = np.ones(n)
    weights = np.concatenate([np.ones(n - iso), np.zeros(iso)])
    # prediction: coupled spins all correct, isolated spins all wrong
    pred = exact.copy()
    pred[-iso:] = -1.0
    pred_bits = bits.signs_to_bits(pred)
    exact_bits = bits.signs_to_bits(exact)

    raw_acc, raw_ov = compute_accuracy_and_overlap(pred_bits, exact_bits, weights)
    assert raw_acc == (n - iso) / n  # reference semantics: every spin scored
    assert raw_ov == 1.0  # zero-weight spins cannot move the overlap

    restr_acc, _ = compute_accuracy_and_overlap(
        pred_bits, exact_bits, weights, informative_mask=~mask
    )
    assert restr_acc == 1.0

    # pinning patches the prediction itself to the oracle's convention
    pinned = pin_uninformative_signs(h, pred_bits, exact_bits)
    pin_acc, _ = compute_accuracy_and_overlap(pinned, exact_bits, weights)
    assert pin_acc == 1.0


def test_apply_padded_slot0_is_diagonal(ring8):
    """make_hamiltonian_extension_reltol drops slot 0 of apply_padded as
    the diagonal (self) term — a load-bearing layout invariant of the
    local-energy cluster machinery (reference semantics:
    sampled_connected_components.py:449-484). Verify the layout, and that
    the extension raises loudly if it is ever violated."""
    from annealing_sign_problem_tpu.ising import _apply_padded_host

    op, _, psi = ring8
    spins = op.basis.states[:17]
    nbrs, coeffs = _apply_padded_host(op, spins)
    np.testing.assert_array_equal(nbrs[:, 0], spins)
    # slot 0 carries the diagonal matrix element <s|H|s>
    for i in (0, 7, 16):
        xs, cs = op.apply(np.uint64(spins[i]))
        diag = dict(zip(xs.tolist(), cs.tolist())).get(int(spins[i]), 0.0)
        assert coeffs[i, 0] == pytest.approx(diag)

    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    model = make_ising_model(spins, op, log_psi_fn=log_fn)

    class _ShiftedOp:
        """Operator whose apply_padded rolls slot 0 away (layout break)."""

        def __init__(self, inner):
            self._inner = inner
            self.basis = inner.basis
            self.max_neighbours = inner.max_neighbours

        def apply_padded(self, states):
            nb, cf = self._inner.apply_padded(states)
            return np.roll(nb, 1, axis=1), np.roll(cf, 1, axis=1)

    broken = model._replace(quantum_hamiltonian=_ShiftedOp(op)) \
        if hasattr(model, "_replace") else None
    if broken is None:
        import dataclasses
        broken = dataclasses.replace(model, quantum_hamiltonian=_ShiftedOp(op))
    with pytest.raises(AssertionError, match="slot 0"):
        make_hamiltonian_extension_reltol(broken, log_fn, reltol=1e-6)
