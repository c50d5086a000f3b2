from anemoi_models_tpu.training.evaluate import evaluate_rollout, rollout_scores
from anemoi_models_tpu.training.loss import WeightedMSELoss, weighted_mse
from anemoi_models_tpu.training.optim import ema_update, make_optimizer
from anemoi_models_tpu.training.rollout import make_rollout_fn
from anemoi_models_tpu.training.step import make_train_step, TrainState

__all__ = [
    "WeightedMSELoss",
    "weighted_mse",
    "make_train_step",
    "TrainState",
    "make_rollout_fn",
    "make_optimizer",
    "ema_update",
    "evaluate_rollout",
    "rollout_scores",
]
