"""Public simulated-annealing API (replica-parallel, TPU-backed).

Mirrors the surface of ``ising_glass_annealer.anneal`` used by the
reference (common.py:242-248: seed / number_sweeps / repetitions /
only_best; gen-1 trace variant square_deep.py:181-186: beta0/beta1 +
energy traces), implemented on the color-parallel Metropolis engine in
ops/sweeps_xla.py. Thousands of independent chains run vmapped per chip;
cross-chip scaling shards the replica axis over a mesh (parallel/).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from .. import bits as _bits
from ..ising import IsingHamiltonian, IsingModel, binary_search
from ..ops.sweeps_dense import (
    DensePlan,
    dense_plan_bytes,
    dense_plan_bytes_exact,
    make_dense_plan,
    run_annealing_dense,
)
from ..ops.sweeps_fat import FatPlan, run_annealing_fat
from ..ops.sweeps_slab import SlabPlan, make_slab_plan, run_annealing_slab
from ..ops.sweeps_xla import ColorPlan, make_color_plan, run_annealing
from ..utils.log import logger
from . import greedy as _greedy

# the dense MXU engine materialises the couplings as one (Kp, Kp) f32
# tensor; the live relay rejects programs touching buffers much beyond
# ~1.5 GB (RESOURCE_EXHAUSTED regardless of free HBM — see RESULTS.md),
# so beyond this budget the multi-slab engine splits J into resident
# sub-cap buffers (one pipelined dispatch per slab per sweep), and only
# past the HBM-resident budget falls back to the sparse gather engine
DENSE_BYTES_LIMIT = 3 << 29
SLAB_TOTAL_LIMIT = 10 << 30  # resident J budget (HBM 16 GB minus state)
# total per-program buffer budget for one dense-engine dispatch (J + the
# two (Kp, R) state tensors): fused-trials runs at R ~ 1e4 on kagome-18
# sized models would reach ~2.4 GB in one program — inside the relay's
# failure zone — so anneal() splits the replicas into groups that keep
# each program under this budget (replicas are independent, so this is
# statistically identical)
DENSE_PROGRAM_BYTES = 1_800_000_000

__all__ = [
    "anneal",
    "AnnealResult",
    "estimate_betas",
    "make_schedule",
    "pin_uninformative_signs",
    "solve_ising_model",
    "uninformative_spins",
]


@dataclass
class AnnealResult:
    """Everything the annealer knows when it stops."""

    bits: np.ndarray  # packed signs of the best replica
    energy: float  # its exact (float64) energy
    bits_all: np.ndarray  # (R, words) packed per-replica reported signs
    # (per-replica better of final-after-descent and best-of-chain)
    energies_all: np.ndarray  # (R,) exact per-replica energies
    trace_current: Optional[np.ndarray]  # (T, R) incremental energies
    trace_best: Optional[np.ndarray]  # (T, R) best-so-far energies
    attempted_flips: int
    elapsed: float

    @property
    def flips_per_second(self) -> float:
        return self.attempted_flips / max(self.elapsed, 1e-12)


def estimate_betas(
    hamiltonian: IsingHamiltonian,
    schedule: str = "linear",
    informative_reltol: Optional[float] = None,
) -> Tuple[float, float]:
    """Annealing window endpoints from the coupling scales.

    ``schedule="linear"`` (linear-in-temperature cooling, the default):
    beta0 sits at the strongest-coupling scale — the core never fully
    melts and gets the bulk of the sweeps (1/T cooling spends time
    proportional to 1/beta near each scale), which is what orders the
    heavy-amplitude backbone reliably. ``schedule="geometric"``: beta0
    makes the hardest flip acceptable with probability 1/2 (full melt)
    and the geometric ramp gives every coupling decade equal time. Both
    end deep below the smallest coupling. The sign-problem couplings span
    many decades (Figure 3a of the paper); measured on kagome-16, the
    linear window converges markedly faster per sweep (P(acc) 0.78 vs
    0.55 at 100 sweeps).

    ``informative_reltol``: end the window at the smallest coupling
    ABOVE ``informative_reltol * max|J|`` instead of the global minimum.
    With noise-floor pinning (:func:`pin_uninformative_signs`) the spins
    below that threshold are overwritten after solving, so cooling
    through their decades is pure waste — kagome-18's couplings span ~37
    decades but only ~13 are informative, so the geometric ramp gets ~3x
    the sweep budget per decade that actually orders spins.
    """
    m = hamiltonian.exchange.tocoo()
    off = (m.row != m.col) & (m.data != 0.0)
    absw = np.abs(m.data[off])
    if absw.size == 0:
        return 0.1, 1.0
    absw_min = absw.min()
    if informative_reltol is not None:
        kept = absw[absw >= informative_reltol * absw.max()]
        if kept.size:
            absw_min = kept.min()
    if schedule == "linear":
        beta0 = float(np.log(2.0) / (4.0 * absw.max()))
    else:
        row_abs_sum = np.zeros(hamiltonian.size)
        np.add.at(row_abs_sum, m.row[off], absw)
        max_delta_e = 2.0 * (
            2.0 * row_abs_sum.max() + np.abs(hamiltonian.field).max(initial=0.0)
        )
        beta0 = float(np.log(2.0) / max_delta_e)
    min_delta_e = 4.0 * absw_min
    beta1 = float(np.log(100.0) / max(min_delta_e, 1e-300))
    # the window may span ~30 decades (kagome-18's smallest amplitudes
    # produce couplings ~1e-30): f32 handles it — exp(-beta*delta)
    # underflows to 0 (reject) for uphill moves and overflows to +inf
    # (accept) for downhill, both exactly the T->0 limit we want; only
    # cap where beta itself would overflow f32
    beta1 = min(beta1, 1e36)
    return beta0, beta1


def make_schedule(beta0: float, beta1: float, T: int, kind: str = "linear") -> np.ndarray:
    """Inverse-temperature sequence for T sweeps.

    "linear": temperature falls linearly 1/beta0 -> 1/beta1 (textbook SA
    cooling; beta ~ beta0/(1 - t/T), so each coupling scale J gets a
    sweep budget ~ T*beta0*J — the strong core dominates).
    "geometric": beta0 * (beta1/beta0)^(t/(T-1)) — equal sweeps per
    coupling decade.
    """
    t = np.arange(T)
    if kind == "linear":
        temps = (1.0 / beta0) + ((1.0 / beta1) - (1.0 / beta0)) * t / max(T - 1, 1)
        # the final step computes temp as a + (b - a) with b ~ 1e-36:
        # the subtraction cancels b entirely and the sum underflows to
        # exactly 0, turning beta into inf past the 1e36 cap estimate_betas
        # promises — clamp to the target temperature floor instead
        return 1.0 / np.maximum(temps, 1.0 / beta1)
    return beta0 * (beta1 / beta0) ** (t / max(T - 1, 1))


def uninformative_spins(
    hamiltonian: IsingHamiltonian, reltol: float = 1e-12
) -> np.ndarray:
    """Boolean mask of spins whose strongest coupling sits below
    ``reltol`` of the global maximum (and whose field is as negligible).

    These correspond to basis states whose amplitudes are at (or below)
    the eigensolver's noise floor — kagome-18's exact ground state has
    2398 strictly-zero amplitudes (9.9% of the sector) plus a tail at
    1e-15..1e-6 whose stored signs are numerical noise. Their couplings
    cannot determine a sign, so any sign metric on them measures the
    oracle's float noise, not reconstruction quality.
    """
    m = hamiltonian.exchange.tocoo()
    off = m.row != m.col
    strongest = np.zeros(hamiltonian.size)
    np.maximum.at(strongest, m.row[off], np.abs(m.data[off]))
    scale = max(strongest.max(initial=0.0), np.abs(hamiltonian.field).max(initial=0.0))
    cut = reltol * scale
    return (strongest <= cut) & (np.abs(hamiltonian.field) <= cut)


def pin_uninformative_signs(
    hamiltonian: IsingHamiltonian,
    bits: np.ndarray,
    initial_signs: np.ndarray,
    reltol: float = 1e-12,
) -> np.ndarray:
    """Overwrite sub-noise-floor spins with the oracle's sign convention
    (after aligning the solution's global gauge with it)."""
    mask = uninformative_spins(hamiltonian, reltol)
    if not mask.any():
        return bits
    K = hamiltonian.size
    signs = _bits.bits_to_signs(bits, K)
    x0_signs = _bits.bits_to_signs(initial_signs, K)
    if np.mean(signs == x0_signs) < 0.5:
        signs = -signs
    signs[mask] = x0_signs[mask]
    return _bits.signs_to_bits(signs)


def _descent_plan(hamiltonian, plan, bucket: bool, repetitions: int = 64):
    """Sparse ColorPlan for the zero-temperature descent phase, cached on
    the main plan object (the dense engine needs a sparse companion for
    exact-delta descent; sparse main plans descend on themselves).

    The update-block size shrinks with the replica count: the descent
    gather materialises a (block, degree, R) f32 working set that must
    stay under the relay's per-program buffer cap even for the fused-
    trials runs at R ~ 1e4."""
    if isinstance(plan, ColorPlan):
        return plan
    block = 512 if repetitions <= 2048 else max(32, (1 << 29) // (64 * 4 * repetitions))
    # cache per block size: a plan reused across anneal() calls with very
    # different R must not inherit the first call's (possibly too large)
    # descent working set
    cache = getattr(plan, "_descent_plans", None)
    if cache is None:
        cache = {}
        object.__setattr__(plan, "_descent_plans", cache)
    if block not in cache:
        cache[block] = make_color_plan(hamiltonian, block_size=block, bucket=bucket)
    return cache[block]


def anneal(
    hamiltonian: IsingHamiltonian,
    x0: Optional[np.ndarray] = None,
    seed: Optional[int] = None,
    number_sweeps: int = 5120,
    repetitions: int = 64,
    only_best: bool = True,
    beta0: Optional[float] = None,
    beta1: Optional[float] = None,
    track_trace: bool = False,
    block_size: Optional[int] = None,
    plan=None,
    engine: str = "auto",
    bucket: bool = False,
    schedule: str = "linear",
    descent_sweeps: int = 20,
    rng_impl: str = "threefry",
    informative_reltol: Optional[float] = None,
    restarts: int = 1,
):
    """Anneal ``repetitions`` independent replicas for ``number_sweeps``
    full sweeps, then descend ``descent_sweeps`` zero-temperature sweeps.

    ``restarts=n`` splits each replica's sweep budget across n independent
    chains of ``number_sweeps // n`` sweeps (independent seeds and random
    starts) and reports, per replica, the chain with the lowest exact
    energy. Nearly work-conserving on the ANNEALED sweeps (the integer
    split drops up to n-1 sweeps per replica; the n chains run as extra
    device-level replicas — better MXU utilisation, not worse), but each
    chain runs its own ``descent_sweeps`` zero-temperature epilogue, so a
    restarted point does n*descent_sweeps descent work per replica where
    a single chain does descent_sweeps. CSV provenance emitted by
    ``full_hilbert_space`` records the restarts count per row so readers
    can account for this. Restarting is strictly better whenever the
    single-chain
    convergence probability has diminishing returns in the sweep count:
    P_restart = 1 - (1 - P(T/n))^n. Measured on kagome-18 (128 chains,
    linear-informative schedule): P(100) = 0.734, P(200) = 0.805,
    P(400) = 0.914 — so 4x100 gives ~0.995 where one 400-sweep chain
    gives 0.914. The energy reduction picks the converged chain exactly:
    the zero-T descent lands converged chains on the true optimum, the
    global minimum. Restarted runs do not record traces.

    Two engines implement the same sweep semantics: "dense" reformulates
    each color-class update as an MXU matmul (fastest; couplings held as a
    dense f32 tensor, used while that fits) and "sparse" streams padded
    neighbour lists through an HBM gather (any size). ``engine="auto"``
    picks by the coupling-tensor footprint; passing a prebuilt ``plan``
    (ColorPlan or DensePlan) pins the engine and skips plan construction.

    The reported states are, per replica, the better of (a) the FINAL
    configuration after the descent phase and (b) the best-of-chain
    snapshot. The descent runs on the sparse engine whose f32 VPU deltas
    are exact, so a replica that annealed into the ground-state basin
    lands on the exact optimum (the reference CSVs show residual == acc:
    its annealer's converged replicas recover the optimum exactly, which
    MXU-truncated deltas alone cannot reproduce); the best-of-chain merge
    guarantees a replica that visited a strictly better state mid-run
    never reports a worse one. ``descent_sweeps=0`` restores pure
    best-of-chain reporting.

    Returns (packed bits, energy) of the best replica when ``only_best``
    (common.py:242-248), otherwise an :class:`AnnealResult` carrying
    per-replica states, energies and optional traces.

    ``rng_impl`` selects the dense engine's acceptance stream: "threefry"
    (jax.random default) or "philox" (XLA RngBitGenerator — cheaper on
    TPU). Only the dense engine honours it; slab/sparse use threefry.
    """
    if seed is None:
        seed = int(np.random.randint(1 << 31))
    K = hamiltonian.size
    R = int(repetitions)

    n_restarts = max(int(restarts), 1)
    if n_restarts > 1:
        n_restarts = min(n_restarts, max(int(number_sweeps), 1))
        if track_trace:
            logger.warning("restarted runs do not record traces; disabling")
        inner = anneal(
            hamiltonian,
            x0=x0,
            seed=seed,
            number_sweeps=int(number_sweeps) // n_restarts,
            repetitions=R * n_restarts,
            only_best=False,
            beta0=beta0,
            beta1=beta1,
            track_trace=False,
            block_size=block_size,
            plan=plan,
            engine=engine,
            bucket=bucket,
            schedule=schedule,
            descent_sweeps=descent_sweeps,
            rng_impl=rng_impl,
            informative_reltol=informative_reltol,
        )
        # chains r*n .. r*n + n-1 belong to replica r; the exact (f64,
        # host) energies make argmin pick the converged chain whenever one
        # exists in the group
        e = inner.energies_all.reshape(R, n_restarts)
        pick = np.arange(R) * n_restarts + e.argmin(axis=1)
        energies = inner.energies_all[pick]
        bits_all = inner.bits_all[pick]
        best = int(np.argmin(energies))
        result = AnnealResult(
            bits=bits_all[best],
            energy=float(energies[best]),
            bits_all=bits_all,
            energies_all=energies,
            trace_current=None,
            trace_best=None,
            attempted_flips=inner.attempted_flips,
            elapsed=inner.elapsed,
        )
        if only_best:
            return result.bits, result.energy
        return result

    colors = None
    slab_dtype = "float32"
    if plan is not None:
        engine = (
            "dense" if isinstance(plan, DensePlan)
            else "fat" if isinstance(plan, FatPlan)
            else "slab" if isinstance(plan, SlabPlan)
            else "sparse"
        )
    elif engine == "auto":
        import jax

        if jax.default_backend() == "cpu":
            # the dense/slab/fat engines trade O(K) gather work for O(K^2)
            # matmuls — a win only on the MXU. On a CPU backend (tests,
            # host-side fallback workers) the sparse gather engine is the
            # right tier at every K.
            engine = "sparse"
        else:
            # color once, decide on the EXACT densified footprint (per-color
            # padding can exceed the cheap estimate), reuse the coloring below
            from .coloring import greedy_coloring

            colors = greedy_coloring(hamiltonian.exchange)
            exact = dense_plan_bytes_exact(colors, K, block_size or 256, bucket)
            if exact <= DENSE_BYTES_LIMIT:
                engine = "dense"
            elif exact <= SLAB_TOTAL_LIMIT:
                engine = "slab"
            elif exact // 2 <= SLAB_TOTAL_LIMIT:
                engine, slab_dtype = "slab", "bfloat16"
            else:
                engine = "sparse"
    if plan is None:
        if engine == "dense":
            plan = make_dense_plan(
                hamiltonian, block_size=block_size or 256, colors=colors,
                bucket=bucket,
            )
        elif engine == "slab":
            plan = make_slab_plan(
                hamiltonian, block_size=block_size or 256, colors=colors,
                bucket=bucket, j_dtype=slab_dtype,
            )
        else:
            plan = make_color_plan(
                hamiltonian, block_size=block_size or 512, colors=colors,
                bucket=bucket,
            )
    b0, b1 = estimate_betas(
        hamiltonian, schedule=schedule, informative_reltol=informative_reltol
    )
    if beta0 is None:
        beta0 = b0
    if beta1 is None:
        beta1 = b1
    T = int(number_sweeps)
    betas = make_schedule(beta0, beta1, T, kind=schedule)

    rng = np.random.RandomState(seed)
    if x0 is not None:
        signs0 = np.tile(_bits.bits_to_signs(x0, K), (R, 1))
    else:
        signs0 = 2.0 * rng.randint(0, 2, size=(R, K)).astype(np.float64) - 1.0

    descend = int(descent_sweeps) > 0

    # replica-group chunking for the dense engine: keep one program's
    # buffers (J + two (Kp, R) state tensors) under DENSE_PROGRAM_BYTES;
    # a single group reproduces the unchunked path exactly
    n_groups = 1
    if engine == "dense":
        itemsize = 2 if plan.j_dtype == "bfloat16" else 4
        kp = plan.J.shape[0] * plan.J.shape[1]
        budget = DENSE_PROGRAM_BYTES - plan.J.size * itemsize
        per_rep = 2 * kp * itemsize
        if budget > 0:
            r_max = max(budget // per_rep, 256)
            n_groups = -(-R // r_max)

    tick = time.perf_counter()
    if engine == "dense" and n_groups > 1:
        # pad R up to a multiple of the group size so every group runs the
        # SAME compiled shape (remote compiles cost minutes); extras are
        # sliced off below
        r_chunk = -(-R // n_groups)
        Rp = n_groups * r_chunk
        signs0p = (
            np.concatenate([signs0, np.repeat(signs0[:1], Rp - R, axis=0)])
            if Rp > R
            else signs0
        )
        logger.debug(
            "dense engine: splitting R={} into {} groups of {}", R, n_groups, r_chunk
        )
        outs, bests, traces = [], [], []
        for ci in range(n_groups):
            g = signs0p[ci * r_chunk : (ci + 1) * r_chunk]
            seed_g = seed + 1000003 * ci
            S_g, _, bestS_g, _, trace_g = run_annealing_dense(
                plan, g, betas, seed=seed_g, track_trace=track_trace,
                need_final=descend, rng_impl=rng_impl,
            )
            if descend:
                dplan = _descent_plan(hamiltonian, plan, bucket, repetitions=r_chunk)
                outS_g, _, _, _, _ = run_annealing(
                    dplan,
                    S_g[:, :K],
                    np.full(int(descent_sweeps), 1e30, dtype=np.float64),
                    seed=seed_g + 1,
                    need_final=True,
                )
            else:
                outS_g = bestS_g
            outs.append(outS_g[:, :K])
            bests.append(bestS_g[:, :K])
            if track_trace and trace_g is not None:
                traces.append(trace_g)
        outS = np.concatenate(outs)[:R]
        bestS = np.concatenate(bests)[:R]
        trace = (
            (
                np.concatenate([t[0] for t in traces], axis=1)[:, :R],
                np.concatenate([t[1] for t in traces], axis=1)[:, :R],
            )
            if traces
            else None
        )
    elif engine == "dense":
        S, _, bestS, bestE_approx, trace = run_annealing_dense(
            plan, signs0, betas, seed=seed, track_trace=track_trace,
            need_final=descend, rng_impl=rng_impl,
        )
    elif engine == "fat":
        S, _, bestS, bestE_approx, trace = run_annealing_fat(
            plan, signs0, betas, seed=seed, track_trace=track_trace,
            need_final=descend,
        )
    elif engine == "slab":
        if track_trace:
            logger.warning("slab engine does not record energy traces")
        S, _, bestS, bestE_approx, trace = run_annealing_slab(
            plan, signs0, betas, seed=seed,
            energies0=hamiltonian.energies(signs0),
            need_final=descend,
        )
    else:
        S, _, bestS, bestE_approx, trace = run_annealing(
            plan, signs0, betas, seed=seed, track_trace=track_trace,
            need_final=descend,
        )
    if not (engine == "dense" and n_groups > 1):
        if descend:
            dplan = _descent_plan(hamiltonian, plan, bucket, repetitions=R)
            outS, _, _, _, _ = run_annealing(
                dplan,
                S[:, :K],
                np.full(int(descent_sweeps), 1e30, dtype=np.float64),
                seed=seed + 1,
                need_final=True,
            )
        else:
            outS = bestS
    elapsed = time.perf_counter() - tick
    outS = outS[:, :K]  # drop bucketed padding spins, if any

    # exact energies of the reported states (float64, host)
    energies = hamiltonian.energies(outS)
    if descend:
        # a replica may have visited a strictly better state mid-chain than
        # where its final descent landed — report the better of the two
        chainS = bestS[:, :K]
        chain_e = hamiltonian.energies(chainS)
        keep_chain = chain_e < energies
        if keep_chain.any():
            outS[keep_chain] = chainS[keep_chain]
            energies[keep_chain] = chain_e[keep_chain]
    attempted = R * K * (T + (int(descent_sweeps) if descend else 0))
    logger.debug(
        "annealing: K={}, R={}, T={}, {:.3f}s, {:.3g} flips/s",
        K, R, T, elapsed, attempted / max(elapsed, 1e-12),
    )

    best = int(np.argmin(energies))
    bits_all = _bits.signs_to_bits_batched(outS)
    result = AnnealResult(
        bits=bits_all[best],
        energy=float(energies[best]),
        bits_all=bits_all,
        energies_all=energies,
        trace_current=trace[0] if trace else None,
        trace_best=trace[1] if trace else None,
        attempted_flips=attempted,
        elapsed=elapsed,
    )
    if only_best:
        return result.bits, result.energy
    return result


def solve_ising_model(
    model: IsingModel,
    mode: str = "sa",
    frozen_spins: Optional[np.ndarray] = None,
    seed: int = 12345,
    number_sweeps: int = 5120,
    repetitions: int = 64,
    only_best: bool = True,
    bucket: bool = False,
    warm_start: bool = False,
    pin_noise_floor: bool = False,
) -> np.ndarray:
    """Solver dispatch matching the reference (common.py:232-261): mode
    'sa' or 'greedy'; ``frozen_spins`` restricts the returned bits to a
    sub-cluster. ``bucket=True`` pads kernel shapes to powers of two so
    heterogeneous cluster streams avoid per-model recompiles.

    Defaults match the reference exactly: SA replicas start at RANDOM
    configurations (the reference's ``sa.anneal`` call passes no x0,
    common.py:242-248) and the output is the solver's verbatim prediction.
    Two explicit opt-ins deviate from that for documented reasons:

    - ``warm_start=True`` seeds every replica with the model's initial
      (amplitude-oracle) signs — useful inside the SA<->NN loop where the
      network's prediction is a genuine prior, but NOT for benchmarking
      against the reference's random-start curves.
    - ``pin_noise_floor=True`` overwrites spins whose couplings sit below
      1e-12 of the strongest one with the oracle's sign convention
      (kagome-18's exact ground state has 9.9% exactly-zero amplitudes —
      no coupling can determine those signs). This changes the metric
      semantics vs the reference, which scores every spin as predicted;
      prefer reporting accuracy restricted to informative spins
      (``uninformative_spins``) over patching the prediction.
    """
    if mode == "sa":
        x, _ = anneal(
            model.ising_hamiltonian,
            x0=model.initial_signs if warm_start else None,
            seed=seed,
            number_sweeps=number_sweeps,
            repetitions=repetitions,
            only_best=only_best,
            bucket=bucket,
        )
    elif mode == "greedy":
        x, _ = _greedy.greedy_solve(model.ising_hamiltonian)
    else:
        raise ValueError(
            f"invalid mode specified: '{mode}'; expected either 'sa' or 'greedy'"
        )
    if pin_noise_floor:
        x = pin_uninformative_signs(model.ising_hamiltonian, x, model.initial_signs)

    if frozen_spins is not None:
        frozen_indices = binary_search(model.spins, _bits.spins_to_array(frozen_spins))
        frozen_signs = _bits.bits_to_signs(x, count=model.spins.size)[frozen_indices]
        x = _bits.signs_to_bits(frozen_signs)
    return x
