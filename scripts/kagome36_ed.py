"""Full kagome-36 ED from scratch: 31.5M representatives on one chip.
Reference check: E0 = -63.12622047596263 (heisenberg_kagome_36.yaml:5).

Round-3 resume: row128 gather matvec (scale.py make_matvec) + deep
two-pass restarts (m=64 costs no memory in the two-pass driver and
contracts ~3x more per restart than the round-2 m=20). Resumes from
/root/k36_ckpt.npz (E=-63.0878 at round-2 end); the 8.5 GB packed table
reloads from /root/k36_blocks in ~2 min.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from annealing_sign_problem_tpu import systems, scale
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config, save_ground_state

t0 = time.time()
basis = basis_from_config(systems.get_system("heisenberg_kagome_36"))
scale.build_basis_at_scale(
    basis, cache_path="physical_systems/data-small/heisenberg_kagome_36_basis.npz"
)
op = operator_from_config(systems.get_system("heisenberg_kagome_36"), basis)
# restarts=0: the f32 phase is done (checkpoint at E = -63.1262209,
# 4e-7 above/at the f32 floor); go straight to the f64 polish
energy, psi = scale.ground_state_codebook(
    op, num_iter=64, restarts=0, chunk_size=2048, super_chunks=256,
    polish_restarts=3, polish_iter=48, tol=1e-10,
    block_cache_dir="/root/k36_blocks",
    checkpoint_path="/root/k36_ckpt.npz",
)
print(f"kagome-36: E0 = {energy} (reference: -63.12622047596263) "
      f"total {time.time()-t0:.0f}s", flush=True)
save_ground_state(
    "physical_systems/data-small/heisenberg_kagome_36.h5", psi, energy, basis.states
)
print("saved h5", flush=True)
