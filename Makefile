# Experiment orchestration for annealing_sign_problem_tpu.
#
# Mirrors the reference's targets (`make small`, `quality_check`,
# `is_frustrated`, `kagome_36`, `pyrochlore_32`, `sk_32_1`, noise/coupling
# sweeps) but needs no external binaries or data downloads: exact
# diagonalisation is recomputed on demand (and cached under
# physical_systems/data-small/), and SA runs replica-parallel on TPU
# instead of a 128-core SLURM node.

PYTHON = python3
RUN = $(PYTHON) -m
JOBID =
NOISE = 0
CUTOFF = 1e-6
ORDER = 2
NUMBER_SAMPLES = 50000
NUM_WORKERS = 1
WORKER_ID = 0

ifneq ($(JOBID),)
  SEED = $(JOBID)
else
  SEED = 435834
endif

SMALL_SYSTEMS = heisenberg_kagome_16 heisenberg_kagome_18 j1j2_square_4x4 \
                sk_16_1 sk_16_2 sk_16_3
TRIALS = 10

all:

.PHONY: yaml
yaml:
	$(RUN) annealing_sign_problem_tpu.experiments.generate_systems \
		--output-dir physical_systems

.PHONY: ed
ed:
	for s in $(SMALL_SYSTEMS); do \
		$(RUN) annealing_sign_problem_tpu.experiments.ed_runner \
			--system $$s --output physical_systems/data-small/$$s.h5; \
	done

.PHONY: small
small: $(addprefix experiments/,$(addsuffix .csv,$(SMALL_SYSTEMS)))

# kagome-18 is the one small system with noise-floor spins (9.9% exactly-
# zero amplitudes): its committed curve uses --pin-noise-floor, which also
# switches the beta ramp to the informative coupling window (RESULTS.md
# "Cooling-schedule study"), and restart splitting (RESULTS.md
# "Restart-splitting study"; work-conserving, solvers/sa.py anneal)
CURVE_EXTRA_heisenberg_kagome_18 = --pin-noise-floor --restarts auto

experiments/%.csv:
	$(RUN) annealing_sign_problem_tpu.experiments.full_hilbert_space \
		--system $(*F) \
		--seed $(SEED) \
		--output $@.wip \
		--number-sweeps 100,200,400,800,1600,3200,6400,12800,25600,51200,102400,204800 \
		--repetitions 1024 \
		--trials $(TRIALS) \
		--fused-trials \
		--bf16 \
		--resume $(CURVE_EXTRA_$(*F)) && \
	mv $@.wip $@

experiments/noise/%.csv:
	@mkdir -p experiments/noise
	$(RUN) annealing_sign_problem_tpu.experiments.analysis noise \
		--system $(*F) \
		--seed $(SEED) \
		--output $@.wip \
		--min-noise 1e-2 --max-noise 1e2 --steps 1000 --repetitions 100 && \
	mv $@.wip $@

experiments/couplings/%.csv:
	@mkdir -p experiments/couplings
	$(RUN) annealing_sign_problem_tpu.experiments.analysis couplings \
		--system $(*F) --output $@.wip && mv $@.wip $@

.PHONY: quality_check
quality_check:
	for s in $(SMALL_SYSTEMS); do \
		echo -n "$$s: "; \
		$(RUN) annealing_sign_problem_tpu.experiments.analysis quality \
			--system $$s 2>/dev/null; \
	done

.PHONY: is_frustrated
is_frustrated: $(addprefix experiments/is_frustrated/,$(addsuffix .csv,$(SMALL_SYSTEMS)))

experiments/is_frustrated/%.csv:
	@mkdir -p experiments/is_frustrated
	$(RUN) annealing_sign_problem_tpu.experiments.analysis frustration \
		--system $(*F) --output $@.wip && mv $@.wip $@

.PHONY: small_amplitude_overlaps
small_amplitude_overlaps:
	for s in $(SMALL_SYSTEMS); do \
		echo -n "$$s: "; \
		$(RUN) annealing_sign_problem_tpu.experiments.analysis amplitude-overlap \
			--system $$s --seed $(SEED) 2>/dev/null; \
	done

# ---- large-system cluster pipelines (Figures 6-8) ----
# Cluster work items scatter over workers deterministically
# (NUM_WORKERS/WORKER_ID replace the reference's SLURM array JOBIDs).

define CLUSTER_RUN
	@mkdir -p experiments/$(1)/noise_$(NOISE)/cutoff_$(CUTOFF)
	$(RUN) annealing_sign_problem_tpu.experiments.sampled_connected_components \
		--system $(2) \
		--seed $(SEED) \
		--output experiments/$(1)/noise_$(NOISE)/cutoff_$(CUTOFF)/$(1).csv$(JOBID) \
		--order $(ORDER) \
		--noise $(NOISE) \
		--no-annealing \
		--global-cutoff $(CUTOFF) \
		--number-samples $(NUMBER_SAMPLES) \
		--num-workers $(NUM_WORKERS) --worker-id $(WORKER_ID)
endef

.PHONY: kagome_36
kagome_36:
	$(call CLUSTER_RUN,kagome,heisenberg_kagome_36)

.PHONY: pyrochlore_32
pyrochlore_32:
	$(call CLUSTER_RUN,pyrochlore,heisenberg_pyrochlore_2x2x2)

.PHONY: sk_32_1
sk_32_1:
	$(call CLUSTER_RUN,sk,sk_32_1)

.PHONY: bench
bench:
	$(PYTHON) bench.py

.PHONY: test
test:
	PYTEST_DISABLE_PLUGIN_AUTOLOAD=1 $(PYTHON) -m pytest tests/ -x -q
