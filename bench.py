"""North-star benchmark: attempted spin flips/sec/chip of the replica-
parallel annealer on a reference workload (BASELINE.json: target 1e9 on
TPU v5e).

Workload: kagome-16 full-Hilbert-space Ising model (K = 12870, the
reference's `make small` benchmark system), 1024 replicas — the reference
schedule's repetition count (Makefile:34). ED amplitudes are recomputed
from scratch and cached; the timed section is the annealing kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_FLIPS_PER_SEC = 1.0e9  # driver-supplied target (BASELINE.json)
CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "physical_systems")

# Soft budget for OPTIONAL engine variants (bf16/philox/fat/block512/
# sparse/slab): once exceeded, remaining variants are skipped so the
# primary number always lands inside the driver's capture window.
SOFT_DEADLINE = time.time() + float(os.environ.get("ASP_BENCH_BUDGET_S", "1500"))

# Best-so-far snapshot, updated after every completed stage. A SIGTERM
# (driver timeout) prints it and exits 0 — a partial capture beats rc=124.
_snapshot = {}
_printed = False


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def update_snapshot(value, details):
    _snapshot.clear()
    _snapshot.update(
        {
            "metric": "attempted spin flips/sec/chip (kagome-16 full basis, R=1024)",
            "value": value,
            "unit": "flips/s",
            "vs_baseline": value / BASELINE_FLIPS_PER_SEC,
            "details": dict(details),
        }
    )


def emit_snapshot_and_exit(signum, frame):
    global _printed
    if _snapshot and not _printed:
        _printed = True
        _snapshot["details"]["partial"] = "driver timeout mid-run; best-so-far"
        print(json.dumps(_snapshot), flush=True)
    os._exit(0 if _snapshot else 124)


def time_left() -> bool:
    return time.time() < SOFT_DEADLINE


def preempt_experiment_queue():
    """The TPU tolerates exactly one client. Long experiment queues
    (scripts/queue_r3_*.sh) record their PIDs under /tmp/*.pid; if the
    driver starts this benchmark while a queue stage is mid-flight, stop
    those exact PIDs (every stage checkpoints/appends, so nothing is
    lost) and give the relay a moment to drop the old session."""
    import glob
    import signal

    def cmdline(pid):
        try:
            return open(f"/proc/{pid}/cmdline", "rb").read().replace(b"\0", b" ").decode()
        except OSError:
            return ""

    stopped = []
    for pf in glob.glob("/tmp/queue*.pid") + glob.glob("/tmp/s2curve.pid"):
        try:
            pid = int(open(pf).read().strip())
        except (ValueError, OSError):
            continue
        try:
            os.kill(pid, 0)
        except (ProcessLookupError, PermissionError):
            continue
        # identity check: a stale pidfile whose PID was recycled by an
        # unrelated process must NOT get that process killed — only kill
        # when the cmdline still looks like one of our queue orchestrators
        cl = cmdline(pid)
        if not ("queue_" in cl or "annealing_sign_problem_tpu" in cl):
            log(f"stale pidfile {pf}: pid {pid} cmdline {cl!r} is not a queue; skipping")
            continue
        # kill the recorded orchestrator AND its direct children (the
        # timeout/python pair) — recorded PIDs only, never name patterns
        try:
            kids = open(f"/proc/{pid}/task/{pid}/children").read().split()
        except OSError:
            kids = []
        for p in [pid] + [int(c) for c in kids]:
            try:
                gk = open(f"/proc/{p}/task/{p}/children").read().split()
            except OSError:
                gk = []
            for q in [p] + [int(c) for c in gk]:
                try:
                    os.kill(q, signal.SIGTERM)
                    stopped.append(q)
                except (ProcessLookupError, PermissionError):
                    pass
    if stopped:
        log(f"preempted experiment queue pids {sorted(set(stopped))}; waiting 20s")
        time.sleep(20)


def wait_for_backend(max_wait_s: float = 300.0):
    """Probe the TPU backend in a SUBPROCESS (JAX caches a failed
    backend set for the life of the process). The total pre-fallback
    budget is HARD-BOUNDED to ~5 minutes: round 4's driver capture
    window expired (rc=124) while a 30-minute retry loop was still
    spinning, so the honest CPU fallback never ran. Two probes of
    <=120 s each, then give up and let the caller fall back."""
    import subprocess

    probe = "import jax; print(jax.devices())"
    deadline = time.time() + max_wait_s
    attempt = 0
    while attempt < 2 and time.time() < deadline:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, text=True,
                timeout=min(120.0, max(10.0, deadline - time.time())),
            )
            rc, out, err = r.returncode, r.stdout, r.stderr
        except subprocess.TimeoutExpired:
            rc, out, err = -1, "", "probe timed out (relay stall)"
        if rc == 0:
            log(f"backend probe ok (attempt {attempt}): {out.strip()}")
            return
        tail = (err or "").strip().splitlines()[-1:] or ["?"]
        log(f"backend probe attempt {attempt} failed: {tail[0]}")
        if attempt < 2:
            log("retrying in 30s")
            time.sleep(30)
    log("backend did not answer within the hard-bounded budget; the "
        "caller will fall back to the CPU capture")


def build_problem():
    from annealing_sign_problem_tpu import ed, systems
    from annealing_sign_problem_tpu.amplitudes import (
        determine_exact_solution,
        ground_state_to_log_coeff_fn,
    )
    from annealing_sign_problem_tpu.io import (
        basis_from_config,
        load_ground_state,
        operator_from_config,
        save_ground_state,
    )
    from annealing_sign_problem_tpu.ising import make_ising_model

    name = "heisenberg_kagome_16"
    config = systems.get_system(name)
    basis = basis_from_config(config).build()
    op = operator_from_config(config, basis)

    cache_file = os.path.join(CACHE, "data-small", f"{name}.h5")
    if os.path.exists(cache_file):
        psi, energy, _ = load_ground_state(cache_file)
        log(f"loaded cached ED: E0 = {energy}")
    else:
        t0 = time.time()
        energy, psi = ed.ground_state(op, num_iter=96, seed=0)
        log(f"ED from scratch: E0 = {energy} ({time.time() - t0:.1f}s)")
        os.makedirs(os.path.dirname(cache_file), exist_ok=True)
        save_ground_state(cache_file, psi, energy, basis.states)

    log_fn = ground_state_to_log_coeff_fn(psi, basis)
    model = make_ising_model(basis.states, op, log_psi_fn=log_fn)
    exact = determine_exact_solution(basis.states, op, psi)
    return model, psi, exact


def backend_available() -> bool:
    """One subprocess probe (a failed in-process backend init is cached
    for the life of the process, so never probe in-process)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=120,
        )
        return r.returncode == 0
    except Exception:
        return False


def cpu_fallback_capture() -> None:
    """Same workload, CPU backend, clearly labelled. Round-3 postmortem:
    a relay outage at capture time turned the round's headline number
    into rc=1. A multi-hour outage (round 4 saw >4 h) makes retrying
    futile; an honestly-labelled host capture demonstrates the capture
    path end-to-end and records WHY the TPU number is absent. The last
    banked TPU capture is cited in the details."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from annealing_sign_problem_tpu.metrics import compute_accuracy_and_overlap
    from annealing_sign_problem_tpu.solvers import anneal

    model, psi, exact = build_problem()
    h = model.ising_hamiltonian
    R, T = 128, 200
    log(f"CPU fallback: K = {h.size}, R = {R}, T = {T} (sparse engine)")
    anneal(h, seed=2, number_sweeps=T, repetitions=R)  # compile
    best, res0 = 0.0, None
    for trial in range(2):
        r = anneal(h, seed=3 + trial, number_sweeps=T, repetitions=R,
                   only_best=False)
        log(f"trial {trial}: {r.elapsed:.2f}s -> {r.flips_per_second:.4g} flips/s")
        best = max(best, r.flips_per_second)
        res0 = res0 or r
    accs = np.array(
        [
            compute_accuracy_and_overlap(res0.bits_all[r], exact, psi**2)[0]
            for r in range(R)
        ]
    )
    p_acc = float(np.mean(accs > 0.995))
    print(
        json.dumps(
            {
                "metric": "attempted spin flips/sec (kagome-16 full basis)",
                "value": best,
                "unit": "flips/s [CPU-backend fallback: TPU relay "
                        "unavailable through the capture window]",
                "vs_baseline": best / BASELINE_FLIPS_PER_SEC,
                "details": {
                    "fallback": "cpu",
                    "p_acc_gt_0995": p_acc,
                    "last_tpu_capture_flips_per_s": 2.63e9,
                    "last_tpu_capture": "BENCH_r02.json (same workload, R=1024)",
                },
            }
        )
    )


def main():
    import signal

    signal.signal(signal.SIGTERM, emit_snapshot_and_exit)
    # BENCH_NO_PREEMPT=1 lets a queue orchestrator invoke the benchmark as
    # one of its own stages without killing its own parent process tree
    if os.environ.get("ASP_BENCH_CPU"):
        cpu_fallback_capture()
        return
    if not os.environ.get("BENCH_NO_PREEMPT"):
        preempt_experiment_queue()
    wait_for_backend()
    if not backend_available():
        log("TPU backend never recovered; re-running the capture on the "
            "CPU backend in a fresh process (labelled in the JSON unit)")
        import subprocess

        env = dict(os.environ, ASP_BENCH_CPU="1")
        r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
        sys.exit(r.returncode)
    import jax

    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")

    from annealing_sign_problem_tpu.metrics import compute_accuracy_and_overlap
    from annealing_sign_problem_tpu.ops.sweeps_dense import make_dense_plan
    from annealing_sign_problem_tpu.ops.sweeps_xla import make_color_plan
    from annealing_sign_problem_tpu.solvers import anneal

    model, psi, exact = build_problem()
    h = model.ising_hamiltonian
    plan = make_dense_plan(h)
    K = h.size
    R = 1024
    NB, M, Kp = plan.J.shape
    log(f"K = {K}, colors = {plan.num_colors}, dense blocks = {NB}x{M}, Kp = {Kp}")

    # compile the timed shape once (6400 sweeps: a reference curve point
    # long enough to amortise the fixed descent/transfer overhead)
    T = 6400
    anneal(h, seed=2, number_sweeps=T, repetitions=R, plan=plan)

    # timed runs (the tunnel to the device can be noisy; take the best)
    best = 0.0
    res0 = None
    for trial in range(2):
        r = anneal(h, seed=3 + trial, number_sweeps=T, repetitions=R, plan=plan, only_best=False)
        log(f"trial {trial}: {r.elapsed:.2f}s -> {r.flips_per_second:.4g} flips/s")
        best = max(best, r.flips_per_second)
        res0 = res0 or r

    # MXU utilisation of the dense engine (bf16 peak on v5e: ~197 TFLOP/s)
    mxu_flops = 2.0 * NB * M * Kp * R * (best / (K * R))  # per second
    mfu = mxu_flops / 197e12
    log(f"dense engine MFU estimate: {mfu:.2f} (bf16 matmul roofline)")

    # the primary number is banked NOW: everything below is an optional
    # engine variant that only improves on it
    details = {
        "dense_f32_flips_per_s": best,
        "dense_mfu_bf16": round(mfu, 3),
    }
    update_snapshot(best, details)

    # secondary point: the sparse gather engine on the same problem (the
    # huge-cluster fallback path of the sampled_connected_components
    # pipeline; HBM-gather issue-rate-bound)
    # bf16 couplings+state dense engine (the committed curve drivers'
    # --bf16 path: halves the HBM traffic per sweep; the exact-f32
    # descent phase still lands converged replicas on the true optimum)
    f32_rate, bf16_rate = best, float("nan")
    try:
        if not time_left():
            raise TimeoutError("soft budget exceeded")
        plan16 = make_dense_plan(h, j_dtype="bfloat16")
        anneal(h, seed=2, number_sweeps=T, repetitions=R, plan=plan16)
        for trial in range(2):
            r16 = anneal(h, seed=7 + trial, number_sweeps=T, repetitions=R,
                         plan=plan16, only_best=False)
            log(f"bf16 trial {trial}: {r16.elapsed:.2f}s -> "
                f"{r16.flips_per_second:.4g} flips/s")
            if not (bf16_rate > r16.flips_per_second):
                bf16_rate, res16 = r16.flips_per_second, r16
        accs16 = np.array(
            [
                compute_accuracy_and_overlap(res16.bits_all[r], exact, psi**2)[0]
                for r in range(R)
            ]
        )
        p_acc16 = float(np.mean(accs16 > 0.995))
        log(f"bf16 P(acc>0.995) @ {T}: {p_acc16:.3f}")
        if p_acc16 >= 0.95:  # only headline bf16 if quality holds
            best = max(best, bf16_rate)
        details["dense_bf16_flips_per_s"] = bf16_rate
        update_snapshot(best, details)
    except Exception as e:
        log(f"bf16 bench skipped: {e!r}")

    # medium-K point, run EARLY (a round-5 deliverable): the multi-slab
    # resident MXU engine at the kagome-36 order-2 cluster scale
    # (K ~ 3.3e4 — the flagship workload's shape, above the single-buffer
    # dense cap). Synthetic couplings with the cluster-like degree; the
    # engine's rate depends on shapes, not values.
    try:
        import scipy.sparse

        from annealing_sign_problem_tpu.ising import IsingHamiltonian
        from annealing_sign_problem_tpu.ops.sweeps_slab import make_slab_plan

        for Ks, Ds in ((33_000, 48), (48_620, 48)):
            if not time_left():
                # round-5 postmortem: the K=48620 slab compile started
                # past the soft budget and hung the capture into the
                # stage timeout — gate every K, not just the stage
                raise TimeoutError("soft budget exceeded")
            rng = np.random.RandomState(0)
            rows = np.repeat(np.arange(Ks), Ds // 2)
            cols = rng.randint(0, Ks, size=rows.size)
            keep = rows != cols
            m = scipy.sparse.coo_matrix(
                (rng.standard_normal(keep.sum()), (rows[keep], cols[keep])),
                shape=(Ks, Ks),
            )
            hs = IsingHamiltonian((0.5 * (m + m.T)).tocsr(), np.zeros(Ks))
            splan = make_slab_plan(hs, j_dtype="bfloat16")
            log(f"slab plan (K={Ks}): {splan.num_slabs} slabs, Kp = {splan.padded_size}")
            # 96 timed sweeps was dispatch-overhead-dominated (r5 capture:
            # 3.4e7 flips/s vs ~1e9 amortised on real curve workloads);
            # time enough sweeps that the per-run fixed cost washes out
            anneal(hs, seed=2, number_sweeps=24, repetitions=R, plan=splan,
                   descent_sweeps=0)
            rslab = anneal(hs, seed=6, number_sweeps=768, repetitions=R,
                           plan=splan, only_best=False, descent_sweeps=0)
            log(f"slab engine (K={Ks}, bf16): {rslab.flips_per_second:.4g} flips/s")
            details[f"slab_engine_flips_per_s_K{Ks}"] = rslab.flips_per_second
            update_snapshot(best, details)
    except Exception as e:  # keep the headline metric robust
        log(f"slab bench skipped: {e!r}")

    # philox acceptance stream (XLA RngBitGenerator) on the bf16 plan:
    # drops the per-block threefry fold_in+uniform (~10% of the sweep)
    philox_rate = float("nan")
    try:
        if not time_left():
            raise TimeoutError("soft budget exceeded")
        anneal(h, seed=2, number_sweeps=T, repetitions=R, plan=plan16,
               rng_impl="philox")
        for trial in range(2):
            rp = anneal(h, seed=9 + trial, number_sweeps=T, repetitions=R,
                        plan=plan16, only_best=False, rng_impl="philox")
            log(f"bf16+philox trial {trial}: {rp.elapsed:.2f}s -> "
                f"{rp.flips_per_second:.4g} flips/s")
            if not (philox_rate > rp.flips_per_second):
                philox_rate, resp = rp.flips_per_second, rp
        accsp = np.array(
            [
                compute_accuracy_and_overlap(resp.bits_all[r], exact, psi**2)[0]
                for r in range(R)
            ]
        )
        p_accp = float(np.mean(accsp > 0.995))
        log(f"bf16+philox P(acc>0.995) @ {T}: {p_accp:.3f}")
        if p_accp >= 0.95:
            best = max(best, philox_rate)
        details["dense_bf16_philox_flips_per_s"] = philox_rate
        update_snapshot(best, details)
    except Exception as e:
        log(f"philox bench skipped: {e!r}")

    # color-class ("fat") engine: kagome-16 colors into 9 classes, so a
    # sweep is 9 class-sized matmuls instead of 55 uniform 256-row block
    # steps — 6x fewer step overheads AND ~5% less padding (per-class
    # 128-row alignment beats per-256-block padding)
    fat_rate = float("nan")
    try:
        if not time_left():
            raise TimeoutError("soft budget exceeded")
        from annealing_sign_problem_tpu.ops.sweeps_fat import make_fat_plan

        fplan = make_fat_plan(h, j_dtype="bfloat16")
        log(f"fat plan: {fplan.num_colors} classes, Kp = {fplan.padded_size}")
        anneal(h, seed=2, number_sweeps=T, repetitions=R, plan=fplan)
        for trial in range(2):
            rf = anneal(h, seed=13 + trial, number_sweeps=T, repetitions=R,
                        plan=fplan, only_best=False)
            log(f"fat bf16 trial {trial}: {rf.elapsed:.2f}s -> "
                f"{rf.flips_per_second:.4g} flips/s")
            if not (fat_rate > rf.flips_per_second):
                fat_rate, resf = rf.flips_per_second, rf
        accsf = np.array(
            [
                compute_accuracy_and_overlap(resf.bits_all[r], exact, psi**2)[0]
                for r in range(R)
            ]
        )
        p_accf = float(np.mean(accsf > 0.995))
        log(f"fat bf16 P(acc>0.995) @ {T}: {p_accf:.3f}")
        if p_accf >= 0.95:
            best = max(best, fat_rate)
        details["fat_bf16_flips_per_s"] = fat_rate
        update_snapshot(best, details)
    except Exception as e:
        log(f"fat bench skipped: {e!r}")

    # block-512 layout on the bf16+philox configuration: half the scan
    # steps per sweep, double the matmul height — pays more class padding,
    # so measure rather than assume (plan layout change only; the kernel
    # is identical)
    b512_rate = float("nan")
    try:
        if not time_left():
            raise TimeoutError("soft budget exceeded")
        plan512 = make_dense_plan(h, block_size=512, j_dtype="bfloat16")
        NB5, M5, Kp5 = plan512.J.shape
        log(f"block-512 plan: {NB5}x{M5}, Kp = {Kp5}")
        anneal(h, seed=2, number_sweeps=T, repetitions=R, plan=plan512,
               rng_impl="philox")
        for trial in range(2):
            rb = anneal(h, seed=11 + trial, number_sweeps=T, repetitions=R,
                        plan=plan512, only_best=False, rng_impl="philox")
            log(f"bf16+philox block-512 trial {trial}: {rb.elapsed:.2f}s -> "
                f"{rb.flips_per_second:.4g} flips/s")
            if not (b512_rate > rb.flips_per_second):
                b512_rate, resb = rb.flips_per_second, rb
        accsb = np.array(
            [
                compute_accuracy_and_overlap(resb.bits_all[r], exact, psi**2)[0]
                for r in range(R)
            ]
        )
        p_accb = float(np.mean(accsb > 0.995))
        log(f"bf16+philox block-512 P(acc>0.995) @ {T}: {p_accb:.3f}")
        if p_accb >= 0.95:
            best = max(best, b512_rate)
        details["dense_bf16_philox_block512_flips_per_s"] = b512_rate
        update_snapshot(best, details)
    except Exception as e:
        log(f"block-512 bench skipped: {e!r}")

    sparse_rate = float("nan")
    try:
        if not time_left():
            raise TimeoutError("soft budget exceeded")
        sparse_plan = make_color_plan(h)
        anneal(h, seed=2, number_sweeps=400, repetitions=R, plan=sparse_plan)
        rs = anneal(h, seed=5, number_sweeps=400, repetitions=R,
                    plan=sparse_plan, only_best=False)
        sparse_rate = rs.flips_per_second
        log(f"sparse engine: {sparse_rate:.4g} flips/s")
        details["sparse_engine_flips_per_s"] = sparse_rate
        update_snapshot(best, details)
    except Exception as e:
        log(f"sparse bench skipped: {e!r}")

    # quality check on the first timed run (reference curve point: the
    # `make small` schedule gives P(acc>0.995) = 0.842 at 6400 sweeps,
    # experiments/heisenberg_kagome_16.csv)
    accs = np.array(
        [
            compute_accuracy_and_overlap(res0.bits_all[r], exact, psi**2)[0]
            for r in range(R)
        ]
    )
    p_acc = float(np.mean(accs > 0.995))
    log(f"P(acc>0.995) @ {T} sweeps: {p_acc:.3f} (reference: 0.842)")

    details["p_acc_gt_0995_at_6400_sweeps"] = p_acc
    details["reference_p_acc"] = 0.842
    update_snapshot(best, details)
    global _printed
    if not _printed:
        _printed = True
        print(json.dumps(_snapshot))


if __name__ == "__main__":
    main()
