"""Environment/device info command."""

from __future__ import annotations

from anemoi_models_tpu.commands import register_command


@register_command("info")
class Info:
    """Print versions and visible accelerator devices."""

    def add_arguments(self, parser) -> None:
        pass

    def run(self, args) -> int:
        import flax
        import jax

        import anemoi_models_tpu

        print(f"anemoi-models-tpu {anemoi_models_tpu.__version__}")
        print(f"jax {jax.__version__}, flax {flax.__version__}")
        print(f"backend: {jax.default_backend()}")
        for d in jax.devices():
            print(f"  {d}")
        return 0
