from .supervised import (
    SignModelState,
    init_sign_model,
    tune_neural_network,
    forward_logits,
    make_optimizer,
)
from .loop import (
    TrainingConfig,
    find_ground_state,
    compute_metrics_on_full_space,
    optimize_sign_structure,
    tune_sign_structure,
    model_log_coeff_fn,
    make_deterministic,
)
