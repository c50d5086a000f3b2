"""Demo training command: the synthetic end-to-end pipeline as a CLI."""

from __future__ import annotations

from anemoi_models_tpu.commands import register_command


@register_command("train-demo")
class TrainDemo:
    """Train a tiny model on synthetic weather and report rollout skill."""

    def add_arguments(self, parser) -> None:
        parser.add_argument("--steps", type=int, default=60)
        parser.add_argument("--grid-lat", type=int, default=12)
        parser.add_argument("--channels", type=int, default=32)

    def run(self, args) -> int:
        import os
        import sys

        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        sys.path.insert(0, os.path.join(root, "examples"))
        from train_tiny import main

        main(steps=args.steps, grid_lat=args.grid_lat, channels=args.channels)
        return 0
