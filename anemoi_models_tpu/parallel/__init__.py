from anemoi_models_tpu.parallel.api import (
    batch_sharding,
    constrain,
    get_mesh,
    make_hybrid_mesh,
    make_mesh,
    set_mesh,
    use_mesh,
)

__all__ = ["batch_sharding", "constrain", "get_mesh", "make_hybrid_mesh", "make_mesh", "set_mesh", "use_mesh"]
