"""sk_32_1 sector ED: 601,080,390 states, table-free combinadic Lanczos.
Writes the reference HDF5 schema on success; per-restart checkpoints
under /root/sk32_ckpt so a relay stall loses at most one restart."""
import sys
import time

from annealing_sign_problem_tpu.experiments.ed_runner import main

t0 = time.time()
rc = main([
    "--system", "sk_32_1", "--method", "sector",
    "--output", "physical_systems/data-small/sk_32_1.h5",
    "--num-iter", "10", "--restarts", "40",
    "--block-cache-dir", "/root",
])
print(f"sk_32_1 ED rc={rc} total {time.time()-t0:.0f}s", flush=True)
sys.exit(rc)
