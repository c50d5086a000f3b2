"""anemoi-models-tpu: a TPU-native weather-emulator model framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``ecmwf/anemoi-models`` (encoder-processor-decoder graph architectures for
data-driven weather forecasting): flax modules over batched static graphs,
``jax.sharding`` device meshes instead of NCCL process groups, Pallas kernels
instead of torch_geometric scatter / flash-attn, and ``jax.checkpoint``
rematerialization instead of torch activation checkpointing.
"""

__version__ = "0.5.1"
