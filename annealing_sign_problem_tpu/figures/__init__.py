from .density import (
    load_cluster_csv,
    estimate_overlap_pdf,
    estimate_overlap_integrated,
    estimate_size_pdf,
    walk_results,
    process_results,
    process_noisy_results,
)
