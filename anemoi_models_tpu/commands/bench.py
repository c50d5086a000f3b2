"""Benchmark command: run the standard grid-points/s benchmark."""

from __future__ import annotations

import os

from anemoi_models_tpu.commands import register_command


@register_command("bench")
class Bench:
    """Run the standard enc-proc-dec benchmark and print its JSON line."""

    def add_arguments(self, parser) -> None:
        parser.add_argument("--grid-lat", type=int, default=96)
        parser.add_argument("--refinements", type=int, default=5)
        parser.add_argument("--channels", type=int, default=256)
        parser.add_argument("--layers", type=int, default=8)
        parser.add_argument("--iters", type=int, default=10)

    def run(self, args) -> int:
        os.environ["BENCH_GRID_LAT"] = str(args.grid_lat)
        os.environ["BENCH_REFINEMENTS"] = str(args.refinements)
        os.environ["BENCH_CHANNELS"] = str(args.channels)
        os.environ["BENCH_LAYERS"] = str(args.layers)
        os.environ["BENCH_ITERS"] = str(args.iters)
        import importlib.util
        import sys

        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        spec = importlib.util.spec_from_file_location("_bench", os.path.join(root, "bench.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules["_bench"] = mod
        spec.loader.exec_module(mod)
        mod.main()
        return 0
