from unetseg_tpu.parallel.sharding import (  # noqa: F401
    make_sharded_eval_step,
    make_sharded_tile_forward,
    make_sharded_train_step,
    replicate_state,
    shard_batch,
)
