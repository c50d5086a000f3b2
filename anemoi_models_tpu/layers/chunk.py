"""Processor chunks: groups of blocks forming one rematerialization unit.

Counterpart of reference ``layers/chunk.py``: a processor splits its
``num_layers`` into ``num_chunks`` chunk modules; each chunk is the
activation-checkpoint boundary (``jax.checkpoint`` here, torch
``checkpoint`` there — reference ``layers/processor.py:73-77``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from anemoi_models_tpu.layers.block import (
    GraphConvProcessorBlock,
    GraphTransformerProcessorBlock,
    TransformerProcessorBlock,
)
from anemoi_models_tpu.layers.mlp import MLP

__all__ = ["TransformerProcessorChunk", "GNNProcessorChunk", "GraphTransformerProcessorChunk"]


class TransformerProcessorChunk(nn.Module):
    """num_layers sliding-window transformer blocks (reference ``chunk.py:66-114``)."""

    num_channels: int
    num_layers: int
    window_size: Optional[int]
    num_heads: int = 16
    mlp_hidden_ratio: int = 4
    activation: str = "GELU"
    dropout_p: float = 0.0
    attention_impl: str = "auto"
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerProcessorBlock(
                num_channels=self.num_channels,
                hidden_dim=self.mlp_hidden_ratio * self.num_channels,
                num_heads=self.num_heads,
                activation=self.activation,
                window_size=self.window_size,
                dropout_p=self.dropout_p,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, deterministic=self.deterministic)
        return x


class GNNProcessorChunk(nn.Module):
    """num_layers message-passing blocks; the first chunk embeds edges
    (reference ``chunk.py:117-181``, ``processor.py:223-224``)."""

    num_channels: int
    num_layers: int
    mlp_extra_layers: int = 0
    activation: str = "SiLU"
    edge_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_attr: jnp.ndarray,
        edge_index: jnp.ndarray,
        tables=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        if self.edge_dim:
            edge_attr = MLP(
                hidden_dim=self.num_channels,
                out_features=self.num_channels,
                n_extra_layers=self.mlp_extra_layers,
                activation=self.activation,
                dtype=self.dtype,
                name="emb_edges",
            )(edge_attr)
        for i in range(self.num_layers):
            x, edge_attr = GraphConvProcessorBlock(
                in_channels=self.num_channels,
                out_channels=self.num_channels,
                mlp_extra_layers=self.mlp_extra_layers,
                activation=self.activation,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, edge_attr, edge_index, None, tables)
        return x, edge_attr


class GraphTransformerProcessorChunk(nn.Module):
    """num_layers per-edge-attention blocks (reference ``chunk.py:184-238``)."""

    num_channels: int
    num_layers: int
    num_heads: int = 16
    mlp_hidden_ratio: int = 4
    activation: str = "GELU"
    kv_src_gather: str = "auto"
    deterministic: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        edge_attr: jnp.ndarray,
        edge_index: jnp.ndarray,
        tables=None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        for i in range(self.num_layers):
            x, edge_attr = GraphTransformerProcessorBlock(
                in_channels=self.num_channels,
                hidden_dim=self.mlp_hidden_ratio * self.num_channels,
                out_channels=self.num_channels,
                num_heads=self.num_heads,
                activation=self.activation,
                kv_src_gather=self.kv_src_gather,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, edge_attr, edge_index, None, self.deterministic, tables)
        return x, edge_attr
