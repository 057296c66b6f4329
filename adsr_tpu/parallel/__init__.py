from adsr_tpu.parallel.sharding import (
    make_parallel_trainer, param_shardings, shard_train_state,
)

__all__ = ["make_parallel_trainer", "param_shardings", "shard_train_state"]
