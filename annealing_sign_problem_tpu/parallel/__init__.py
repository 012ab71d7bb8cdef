from .mesh import (
    make_mesh,
    anneal_sharded,
    train_step_data_parallel,
    sharded_matvec_fn,
    distribute_clusters,
)
