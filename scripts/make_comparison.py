"""Regenerate experiments/COMPARISON.md from the committed curve CSVs.

Compares our `full_hilbert_space` curves (experiments/*.csv) against the
reference's committed curves (reference experiments/*.csv — identical
schema, full_hilbert_space.py:319-338) at matching sweep counts, for all
three probabilities. Only rows present in BOTH files are compared, and
the provenance (trials, start condition) is taken from the files
themselves: a curve with every std == 0 is flagged single-trial.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/experiments"
SYSTEMS = [
    "heisenberg_kagome_16",
    "heisenberg_kagome_18",
    "j1j2_square_4x4",
    "sk_16_1",
    "sk_16_2",
    "sk_16_3",
]


def load(path):
    tab = np.loadtxt(path, delimiter=",", skiprows=1, ndmin=2)
    return {int(r[0]): r for r in tab}


def load_provenance(path):
    """Per-row provenance comments written by full_hilbert_space
    (`# sweeps=N repetitions=R trials=T ... restarts=n ...`)."""
    prov = {}
    with open(path) as f:
        for ln in f:
            if ln.startswith("# sweeps="):
                d = dict(kv.split("=", 1) for kv in ln[2:].split() if "=" in kv)
                prov[int(d["sweeps"])] = d
    return prov


def protocol_note(prov):
    """A disclosure line whenever a curve's actual protocol deviates from
    the headline 1024-replica / 10-trial single-chain setup (ADVICE r4:
    the kagome-18 CPU rows are 128x2 with restarts 2-8 — best-of-n
    chains — and the blanket header overstated them)."""
    if not prov:
        return None
    stats = sorted({(d.get("repetitions", "?"), d.get("trials", "?")) for d in prov.values()})
    restarts = sorted({int(d.get("restarts", 1)) for d in prov.values()})
    deviates = stats != [("1024", "10")] or restarts != [1]
    if not deviates:
        return None
    parts = []
    parts.append(
        "actual statistics: "
        + ", ".join(f"{r} replicas x {t} trials" for r, t in stats)
    )
    if restarts != [1]:
        lo, hi = restarts[0], restarts[-1]
        rng = f"{lo}" if lo == hi else f"{lo}-{hi}"
        parts.append(
            f"restart splitting `--restarts auto` in effect (n = {rng}: each "
            "replica's sweep budget is split across n independent chains and "
            "the lowest-energy chain reported — same annealed-flip budget "
            "per replica, but n zero-T descent epilogues instead of 1; the "
            "reference column is single-chain)"
        )
    return "_Protocol for this curve: " + "; ".join(parts) + "._"


def table_lines(ours, ref):
    lines = [
        "| sweeps | P(acc) ours | ref | delta | P(overlap) ours | ref "
        "| P(residual) ours | ref |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n in sorted(ours):
        o = ours[n]
        if n not in ref:
            lines.append(
                f"| {n} | {o[1]:.4f} ± {o[2]:.4f} | — | — "
                f"| {o[6]:.4f} | — | {o[11]:.4f} | — |"
            )
            continue
        r = ref[n]
        lines.append(
            f"| {n} | {o[1]:.4f} ± {o[2]:.4f} | {r[1]:.4f} ± {r[2]:.4f} "
            f"| **{o[1] - r[1]:+.4f}** | {o[6]:.4f} | {r[6]:.4f} "
            f"| {o[11]:.4f} | {r[11]:.4f} |"
        )
    return lines


def main():
    out = [
        "# Small-system convergence: ours vs reference (`make small`, Figure 2)",
        "",
        "Default protocol on both sides: 1024 annealing replicas per trial,",
        "10 trials, random replica initialisation (the reference's",
        "`sa.anneal` call passes no x0, common.py:242-248; our driver",
        "default is `--x0 random`). Curves that deviate (fewer",
        "replicas/trials, restart splitting) carry an explicit protocol",
        "note under their heading.",
        "P(x) = fraction of replicas with accuracy/overlap > 0.995 or",
        "relative residual energy <= 1e-12. delta = ours - reference.",
        "",
    ]
    for s in SYSTEMS:
        ours_path = os.path.join(REPO, "experiments", f"{s}.csv")
        ref_path = os.path.join(REF, f"{s}.csv")
        cpu_fallback = False
        if not os.path.exists(ours_path):
            # a TPU-relay outage window can leave only the host-side curve
            # (same driver, same thresholds, sparse engine, smaller stats);
            # compare against it rather than hiding the system
            cpu_path = os.path.join(REPO, "experiments", f"{s}_cpu.csv")
            if os.path.exists(cpu_path):
                ours_path, cpu_fallback = cpu_path, True
            else:
                out += [f"## {s}", "", "_no committed curve yet_", ""]
                continue
        ours, ref = load(ours_path), load(ref_path)
        single_trial = all(v[2] == 0.0 for v in ours.values())
        out.append(f"## {s}")
        out.append("")
        note = protocol_note(load_provenance(ours_path))
        if note:
            out.append(note)
            out.append("")
        if cpu_fallback:
            out.append(
                "_CPU-fallback curve (`" + os.path.basename(ours_path) +
                "`): same driver and thresholds, sparse engine on the "
                "host, smaller statistics (see the per-row provenance "
                "comments in the CSV). Captured while the TPU relay was "
                "unavailable._"
            )
            out.append("")
        if single_trial:
            out.append("_WARNING: our file is single-trial (std columns are 0)._")
            out.append("")
        if s == "heisenberg_kagome_18":
            out.append(
                "_Generated with `--pin-noise-floor` (linear cooling over "
                "the informative coupling window): "
                "9.9% of this sector's exact amplitudes are exactly zero "
                "(isolated Ising vertices), so no coupling can determine "
                "their sign. The reference scores those spins against its "
                "own eigensolver noise (its couplings are built from the "
                "same noise signs, so its solver reproduces them "
                "tautologically); pinning to the oracle convention is the "
                "equivalent semantics on our side. See RESULTS.md, \"The "
                "kagome-18 accuracy story\"._"
            )
            out.append("")
        out += table_lines(ours, ref)
        out.append("")
        variant_path = os.path.join(
            REPO, "experiments", f"{s}_restarts.csv"
        )
        if os.path.exists(variant_path):
            out.append("### restart-split variant (same system)")
            out.append("")
            out.append(
                "_Same total annealed-flip budget per replica, split "
                "across n = min(8, max(1, T//100)) independent chains with "
                "the lowest-energy chain reported (plus n zero-T descent "
                "epilogues instead of 1 — disclosed deviation; see "
                "RESULTS.md, restart-splitting study). The single-chain "
                "table above is the protocol-identical comparison; this "
                "one shows what the engine does with the same sweep "
                "budget spent smarter._"
            )
            out.append("")
            vnote = protocol_note(load_provenance(variant_path))
            if vnote:
                out.append(vnote)
                out.append("")
            out += table_lines(load(variant_path), ref)
            out.append("")
    dest = os.path.join(REPO, "experiments", "COMPARISON.md")
    with open(dest, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {dest}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
