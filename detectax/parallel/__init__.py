from detectax.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_sharded_train_step,
    replicated_sharding,
    shard_train_state,
)
