"""Full kagome-36 ED from scratch: 31.5M representatives on one chip.
Reference check: E0 = -63.12622047596263 (heisenberg_kagome_36.yaml:5)."""
import time
import numpy as np
from annealing_sign_problem_tpu import systems, scale
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config, save_ground_state

t0 = time.time()
basis = basis_from_config(systems.get_system("heisenberg_kagome_36"))
scale.build_basis_at_scale(
    basis, cache_path="physical_systems/data-small/heisenberg_kagome_36_basis.npz"
)
op = operator_from_config(systems.get_system("heisenberg_kagome_36"), basis)
# num_iter=12: V is (m, 31.5M) f32 next to the 8.5 GB resident table —
# m=24 and m=16 both OOMed the chip at the first Lanczos step
energy, psi = scale.ground_state_codebook(
    op, num_iter=20, restarts=160, chunk_size=2048, super_chunks=256,
    polish_restarts=4, polish_iter=10, thick=5, tol=1e-10,
    block_cache_dir="/root/k36_blocks",
    checkpoint_path="/root/k36_ckpt.npz",
)
print(f"kagome-36: E0 = {energy} (reference: -63.12622047596263) "
      f"total {time.time()-t0:.0f}s", flush=True)
save_ground_state(
    "physical_systems/data-small/heisenberg_kagome_36.h5", psi, energy, basis.states
)
print("saved h5", flush=True)
