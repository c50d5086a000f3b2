from anemoi_models_tpu.ops.attention import dot_product_attention
from anemoi_models_tpu.ops.segment import gather_nodes, segment_max, segment_softmax, segment_sum

__all__ = [
    "dot_product_attention",
    "gather_nodes",
    "segment_max",
    "segment_softmax",
    "segment_sum",
]
