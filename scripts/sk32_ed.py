"""sk_32_1 sector ED: 601,080,390 states, table-free combinadic Lanczos.

Writes the reference HDF5 schema on success; per-restart checkpoints
under .cache/ so a bounded window (or a relay stall) loses at most one
restart. Full convergence projects to 13-20 h of TPU
(RESULTS.md "Known limits"); short windows accumulate restarts across
invocations via the checkpoint, so run this as often as the queue
allows. num_iter is small (4) so each two-pass restart (~2*num_iter
matvecs at ~2-3 min/matvec) fits inside a sub-hour window and always
persists its progress.
"""
import sys
import time

from annealing_sign_problem_tpu.experiments.ed_runner import main

num_iter = sys.argv[1] if len(sys.argv) > 1 else "4"
restarts = sys.argv[2] if len(sys.argv) > 2 else "40"
t0 = time.time()
rc = main([
    "--system", "sk_32_1", "--method", "sector",
    "--output", "physical_systems/data-small/sk_32_1.h5",
    "--num-iter", num_iter, "--restarts", restarts,
    "--block-cache-dir", "/root/repo/.cache",
])
print(f"sk_32_1 ED rc={rc} total {time.time()-t0:.0f}s", flush=True)
sys.exit(rc)
