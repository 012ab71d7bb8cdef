from .sa import anneal, AnnealResult, estimate_betas, solve_ising_model
from .greedy import greedy_solve, greedy_solve_signs
from .coloring import greedy_coloring, color_classes
from .batch import anneal_batched, concat_hamiltonians
