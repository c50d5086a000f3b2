from anemoi_models_tpu.parallel.api import (
    batch_sharding,
    constrain,
    get_mesh,
    make_hybrid_mesh,
    make_mesh,
    set_mesh,
    use_mesh,
)
from anemoi_models_tpu.parallel.fsdp import (
    array_shardings,
    shard_train_state,
    train_state_shardings,
)

__all__ = [
    "array_shardings",
    "batch_sharding",
    "constrain",
    "get_mesh",
    "make_hybrid_mesh",
    "make_mesh",
    "set_mesh",
    "shard_train_state",
    "train_state_shardings",
    "use_mesh",
]
