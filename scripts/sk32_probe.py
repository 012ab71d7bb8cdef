"""Measure the real per-dispatch cost of the piece-split sk_32_1 matvec.

The reference diagonalised the 601,080,390-state SK instance with the
external SpinED binary on a large CPU node (reference Makefile:128-141,
physical_systems/sk_32_1.yaml). Our TPU path is the table-free
combinadic sector Lanczos (sector.py) with the vector split into two
~1.2 GB pieces so every program stays under the relay's per-program
buffer wall. This probe compiles the split matvec at full scale, times a
few output spans, and prints ONE JSON line extrapolating the cost of a
full matvec / Lanczos restart — the go/no-go number for scheduling the
actual ED window.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from annealing_sign_problem_tpu import systems
from annealing_sign_problem_tpu.io import basis_from_config, operator_from_config
from annealing_sign_problem_tpu.sector import (
    make_sector_matvec_split,
    sector_dimension,
)

NUM_PIECES = 2
B, G = 512, 2048  # span = 1,048,576 rows per output span


def main():
    config = systems.get_system("sk_32_1")
    op = operator_from_config(config, basis_from_config(config))
    n, k = 32, 16
    dim = sector_dimension(n, k)

    t0 = time.time()
    mv, per, Kp = make_sector_matvec_split(
        op, NUM_PIECES, rows_per_chunk=B, chunks_per_dispatch=G
    )
    span = B * G
    spans_total = Kp // span
    rng = np.random.RandomState(0)
    pieces = [
        jax.device_put(rng.standard_normal(per).astype(np.float32))
        for _ in range(NUM_PIECES)
    ]
    for p in pieces:
        p.block_until_ready()
    t_setup = time.time() - t0
    print(f"setup {t_setup:.0f}s; dim={dim} per={per} spans={spans_total}",
          file=sys.stderr, flush=True)

    # first span pays the compile (relay: 40 s - 20 min)
    t0 = time.time()
    y = mv(pieces, spans_limit=1)
    y[0].block_until_ready()
    t_compile = time.time() - t0
    print(f"compile+first span {t_compile:.0f}s", file=sys.stderr, flush=True)

    n_probe = 4
    t0 = time.time()
    y = mv(pieces, spans_limit=n_probe)
    y[0].block_until_ready()
    t_span = (time.time() - t0) / n_probe

    sec_matvec = t_span * spans_total
    # one restart = pass 1 (m matvecs) + pass 2 (<= m matvecs) + O(m) axpys
    m = 10
    sec_restart = 2 * m * sec_matvec
    gathers = span * NUM_PIECES * min(op.max_neighbours, k * (n - k) + 1)
    print(json.dumps({
        "probe": "sk32_split_matvec",
        "dim": dim,
        "num_pieces": NUM_PIECES,
        "rows_per_chunk": B,
        "chunks_per_dispatch": G,
        "sec_per_span": round(t_span, 3),
        "sec_per_matvec_est": round(sec_matvec, 1),
        "sec_per_restart_est_m10": round(sec_restart, 1),
        "row_gathers_per_sec": round(gathers / t_span, 0),
        "compile_s": round(t_compile, 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
