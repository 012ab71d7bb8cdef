from .mesh import (
    make_mesh,
    anneal_sharded,
    anneal_sharded_dense,
    train_step_data_parallel,
    sharded_matvec_fn,
    distribute_clusters,
)
