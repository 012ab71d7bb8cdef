from .sweeps_xla import ColorPlan, make_color_plan, run_annealing
