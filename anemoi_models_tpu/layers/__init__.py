from anemoi_models_tpu.layers.attention import MultiHeadSelfAttention
from anemoi_models_tpu.layers.block import (
    GraphConvMapperBlock,
    GraphConvProcessorBlock,
    GraphTransformerMapperBlock,
    GraphTransformerProcessorBlock,
    TransformerProcessorBlock,
)
from anemoi_models_tpu.layers.bounding import (
    FractionBounding,
    HardtanhBounding,
    LeakyReluBounding,
    ReluBounding,
)
from anemoi_models_tpu.layers.chunk import (
    GNNProcessorChunk,
    GraphTransformerProcessorChunk,
    TransformerProcessorChunk,
)
from anemoi_models_tpu.layers.conv import GraphConv, graph_transformer_conv
from anemoi_models_tpu.layers.graph import NamedNodesAttributes, TrainableTensor
from anemoi_models_tpu.layers.mapper import (
    GNNBackwardMapper,
    GNNForwardMapper,
    GraphTransformerBackwardMapper,
    GraphTransformerForwardMapper,
)
from anemoi_models_tpu.layers.mlp import MLP
from anemoi_models_tpu.layers.processor import (
    GNNProcessor,
    GraphTransformerProcessor,
    TransformerProcessor,
)

__all__ = [
    "MLP",
    "MultiHeadSelfAttention",
    "TrainableTensor",
    "NamedNodesAttributes",
    "GraphConv",
    "graph_transformer_conv",
    "TransformerProcessorBlock",
    "GraphConvProcessorBlock",
    "GraphConvMapperBlock",
    "GraphTransformerProcessorBlock",
    "GraphTransformerMapperBlock",
    "TransformerProcessorChunk",
    "GNNProcessorChunk",
    "GraphTransformerProcessorChunk",
    "TransformerProcessor",
    "GNNProcessor",
    "GraphTransformerProcessor",
    "GraphTransformerForwardMapper",
    "GraphTransformerBackwardMapper",
    "GNNForwardMapper",
    "GNNBackwardMapper",
    "ReluBounding",
    "LeakyReluBounding",
    "HardtanhBounding",
    "FractionBounding",
]
