"""Enumerate the kagome-36 symmetry-adapted basis (31.5M representatives
out of 9.08e9 sector states) on the TPU and cache it."""
import time
from annealing_sign_problem_tpu import systems, scale
from annealing_sign_problem_tpu.io import basis_from_config

t0 = time.time()
basis = basis_from_config(systems.get_system("heisenberg_kagome_36"))
scale.build_basis_at_scale(
    basis,
    cache_path="physical_systems/data-small/heisenberg_kagome_36_basis.npz",
    hi_batch=8,
)
print(f"kagome-36: {basis.number_states} representatives in {time.time()-t0:.0f}s", flush=True)
assert basis.number_states == 31527894, basis.number_states  # heisenberg_kagome_36.yaml:4
