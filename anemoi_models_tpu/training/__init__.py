from anemoi_models_tpu.training.dataset import (
    H5Dataset,
    MemmapDataset,
    SyntheticSource,
    ZarrDataset,
    open_dataset,
    save_memmap_dataset,
    save_zarr_dataset,
)
from anemoi_models_tpu.training.evaluate import evaluate_interface, evaluate_rollout, rollout_scores
from anemoi_models_tpu.training.loader import BatchLoader, WindowSampler, device_prefetch
from anemoi_models_tpu.training.loss import WeightedMSELoss, weighted_mse
from anemoi_models_tpu.training.optim import ema_update, make_optimizer
from anemoi_models_tpu.training.rollout import make_rollout_fn
from anemoi_models_tpu.training.run import train_run
from anemoi_models_tpu.training.step import make_rollout_train_step, make_train_step, TrainState

__all__ = [
    "BatchLoader",
    "H5Dataset",
    "MemmapDataset",
    "SyntheticSource",
    "ZarrDataset",
    "TrainState",
    "WeightedMSELoss",
    "WindowSampler",
    "device_prefetch",
    "ema_update",
    "evaluate_interface",
    "evaluate_rollout",
    "make_optimizer",
    "make_rollout_fn",
    "make_rollout_train_step",
    "make_train_step",
    "open_dataset",
    "rollout_scores",
    "save_memmap_dataset",
    "save_zarr_dataset",
    "train_run",
    "weighted_mse",
]
