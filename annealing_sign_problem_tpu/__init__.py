"""annealing_sign_problem_tpu — a TPU-native framework for bootstrapping
many-body quantum sign structures from wavefunction amplitudes.

Given the amplitudes |psi(s)| of a frustrated quantum spin system's ground
state, the signs sign(psi(s)) are recovered by building an auxiliary
classical Ising model on a subset K of Hilbert-space basis states with
couplings J_ij = <s_i|H|s_j> * |psi_i| * |psi_j| and minimising its energy
with simulated annealing (replica-parallel Metropolis on TPU) or a
deterministic greedy algorithm (native C++).

This is a ground-up JAX/XLA/Pallas re-design of the capabilities of the
reference implementation (twesterhout/annealing-sign-problem): the compute
path is jitted and mesh-shardable, spin configurations are bit-packed
uint64 words, the Hamiltonian is a compiled term table applied with static
shapes, and the annealer runs thousands of independent chains per chip.

Public API largely mirrors the reference's ``annealing_sign_problem.common``
(see reference common.py:1-1025) so that users of the reference find the
same entry points here.
"""

import jax as _jax

# 64-bit spin words (uint64) are a first-class citizen of this framework;
# all floating-point compute uses explicit dtypes (bfloat16/float32) so the
# x64 default only affects integer state handling.
_jax.config.update("jax_enable_x64", True)

from . import bits
from .basis import SpinBasis
from .operator import Operator
from .io import (
    load_yaml_config,
    load_hamiltonian,
    load_ground_state,
    save_ground_state,
    load_input_files,
)
from .ising import (
    IsingModel,
    make_ising_model,
    make_hamiltonian_extension,
    sparsify_using_global_cutoff,
    dump_ising_model_to_hdf5,
    load_ising_model_from_hdf5,
)
from .metrics import (
    compute_accuracy_and_overlap,
    cluster_statistics,
    compute_distribution_of_couplings,
)
from .sampling import (
    SamplingResult,
    monte_carlo_sampling,
    create_small_cluster_around_point,
    random_cluster_size,
)
from .noise import add_noise_to_amplitudes, amplitude_overlap
from .amplitudes import ground_state_to_log_coeff_fn, determine_exact_solution
from .solvers import anneal, greedy_solve, solve_ising_model
from .graph import AlmostInfiniteGraph
from . import ed
from . import systems

__version__ = "0.1.0"
