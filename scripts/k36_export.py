"""Export the kagome-36 Lanczos checkpoint as the reference-schema h5
(best Ritz vector so far; E recorded in the file's eigenvalues)."""
import sys
import numpy as np
from annealing_sign_problem_tpu import systems, scale
from annealing_sign_problem_tpu.io import basis_from_config, save_ground_state

ckpt = sys.argv[1] if len(sys.argv) > 1 else "/root/k36_ckpt.npz"
out = sys.argv[2] if len(sys.argv) > 2 else "physical_systems/data-small/heisenberg_kagome_36.h5"
data = np.load(ckpt)
theta, x = float(data["theta"]), data["x"].astype(np.float64)
x /= np.linalg.norm(x)
basis = basis_from_config(systems.get_system("heisenberg_kagome_36"))
scale.build_basis_at_scale(
    basis, cache_path="physical_systems/data-small/heisenberg_kagome_36_basis.npz"
)
assert len(x) == basis.number_states, (len(x), basis.number_states)
save_ground_state(out, x, theta, basis.states)
print(f"wrote {out}: E = {theta} (target -63.12622047596263)", flush=True)
