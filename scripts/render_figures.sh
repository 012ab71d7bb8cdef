#!/bin/bash
# Re-render every figure in figures_out/ from the committed experiment
# data (CPU-only; matplotlib). Run after curve/cluster data changes.
set -e
cd "$(dirname "$0")/.." || exit 1
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
R() { python -m annealing_sign_problem_tpu.figures.render "$@"; }

# Figure 2: small-system convergence curves (only systems with a CSV)
args=()
for s in heisenberg_kagome_16 heisenberg_kagome_18 j1j2_square_4x4 \
         sk_16_1 sk_16_2 sk_16_3; do
  if [ -f "experiments/$s.csv" ]; then
    args+=(--csv "$s=experiments/$s.csv")
  elif [ -f "experiments/${s}_cpu.csv" ]; then
    # host-captured curve (TPU relay outage window) — same schema
    args+=(--csv "$s=experiments/${s}_cpu.csv")
  fi
done
R small "${args[@]}" --output figures_out/annealing_on_small_systems.png

# Figures 6-8: kagome-36 cluster densities (all committed batches)
K36=(experiments/kagome/noise_0/cutoff_1e-06/kagome.csv*)
R overlap-pdf "${K36[@]}" --output figures_out/kagome_36_overlap-pdf.png
R overlap-integrated "${K36[@]}" --output figures_out/kagome_36_overlap-integrated.png
R overlap-integrated-per-size "${K36[@]}" \
  --output figures_out/kagome_36_overlap-integrated-per-size.png
R size-pdf "${K36[@]}" --output figures_out/kagome_36_size-pdf.png

# pyrochlore-32 cluster densities, if a batch is committed
PYRO=(experiments/pyrochlore/noise_0/cutoff_2e-06/pyrochlore.csv*)
if [ -e "${PYRO[0]}" ]; then
  R overlap-pdf "${PYRO[@]}" --output figures_out/pyrochlore_32_overlap-pdf.png
  R size-pdf "${PYRO[@]}" --output figures_out/pyrochlore_32_size-pdf.png
fi
echo "figures_out/ refreshed"
