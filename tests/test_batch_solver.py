import numpy as np
import pytest

from annealing_sign_problem_tpu import bits, ed, systems
from annealing_sign_problem_tpu.amplitudes import (
    determine_exact_solution,
    ground_state_to_log_coeff_fn,
)
from annealing_sign_problem_tpu.basis import SpinBasis
from annealing_sign_problem_tpu.ising import make_ising_model
from annealing_sign_problem_tpu.metrics import compute_accuracy_and_overlap
from annealing_sign_problem_tpu.operator import Operator, TermGroup
from annealing_sign_problem_tpu.sampling import create_small_cluster_around_point
from annealing_sign_problem_tpu.solvers import anneal_batched, concat_hamiltonians


@pytest.fixture(scope="module")
def ring10():
    n = 10
    bonds = [[i, (i + 1) % n] for i in range(n)]
    basis = SpinBasis(number_spins=n, hamming_weight=5).build()
    op = Operator(
        basis, [TermGroup(np.array(systems.heisenberg_matrix()), np.array(bonds))]
    )
    energy, psi = ed.ground_state(op, num_iter=64, seed=3)
    return op, psi


def test_concat_hamiltonians_energy_additivity(ring10):
    op, psi = ring10
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    rng = np.random.RandomState(0)
    models = []
    for k in range(3):
        cluster = np.asarray(
            create_small_cluster_around_point(
                int(op.basis.states[rng.randint(op.basis.number_states)]),
                op, required_size=12, rng=rng,
            ),
            dtype=np.uint64,
        )
        models.append(make_ising_model(cluster, op, log_psi_fn=log_fn))
    big, offsets = concat_hamiltonians([m.ising_hamiltonian for m in models])
    assert big.size == sum(m.size for m in models)
    signs = 2.0 * rng.randint(0, 2, big.size) - 1.0
    total = big.energy(signs)
    parts = sum(
        m.ising_hamiltonian.energy(signs[offsets[i] : offsets[i + 1]])
        for i, m in enumerate(models)
    )
    assert total == pytest.approx(parts, abs=1e-10)


def test_anneal_batched_recovers_signs(ring10):
    op, psi = ring10
    log_fn = ground_state_to_log_coeff_fn(psi, op.basis)
    rng = np.random.RandomState(1)
    models, exacts, weights = [], [], []
    for k in range(4):
        cluster = np.asarray(
            create_small_cluster_around_point(
                int(op.basis.states[rng.randint(op.basis.number_states)]),
                op, required_size=15, rng=rng,
            ),
            dtype=np.uint64,
        )
        m = make_ising_model(cluster, op, log_psi_fn=log_fn)
        models.append(m)
        exacts.append(determine_exact_solution(m.spins, op, psi))
        w = psi[op.basis.index(m.spins)] ** 2
        weights.append(w / w.sum())

    results = anneal_batched(models, seed=3, number_sweeps=300, repetitions=16)
    assert len(results) == 4
    for xb, exact, w in zip(results, exacts, weights):
        acc, overlap = compute_accuracy_and_overlap(xb, exact, w)
        assert overlap > 0.95
