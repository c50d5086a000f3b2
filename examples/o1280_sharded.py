"""O1280 (AIFS production scale) end-to-end sharded proof.

The whole model-sharding architecture exists for this scale — the reference's
model-comm-group design (``/root/reference/src/anemoi/models/distributed/
graph.py:140-298``) shards the 6.6M-point grid because one device cannot hold
the activations. This script is the executable evidence, in two legs:

1. ``--leg run`` (emulated CPU mesh): the full GraphTransformer
   enc-proc-dec at true O1280 geometry (6,599,680-point octahedral grid,
   refinement-8 hidden mesh; 61.7M/5.2M/19.8M edges) is jitted over an
   8-device ``model`` axis and EXECUTED — forward and one optimizer step —
   with the dense+halo path (processor halo exchange, GSPMD mappers).
   The compiled HLO is audited: no collective moves a full node tensor.

       env PYTHONPATH= JAX_PLATFORMS=cpu \
           XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python examples/o1280_sharded.py --leg run --channels 64 --layers 2

2. ``--leg budget`` (real v5p compiler, AOT): the same programs are compiled
   against a described v5p 2x2x2 (8-chip) topology at production widths
   (C=512 and C=1024, L=16, bf16, AIFS-class variable count) and the TPU
   compiler's own per-chip memory stats (argument + output + temp bytes) are
   reported against v5p's 96 GB HBM — a measured per-shard HBM budget, not
   arithmetic. Run on the default (axon) backend:

       python examples/o1280_sharded.py --leg budget

Smaller geometries for plumbing checks: ``--grid-lat 320 --refinements 6``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def load_or_build_graph(grid_lat: int, refinements: int):
    from anemoi_models_tpu.graphs import HeteroGraph, build_enc_proc_dec_graph

    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"o{grid_lat}_r{refinements}.npz")
    if os.path.exists(path):
        t0 = time.time()
        g = HeteroGraph.load(path)
        log(f"graph loaded from {path} in {time.time() - t0:.0f}s")
        return g
    t0 = time.time()
    g = build_enc_proc_dec_graph(
        grid_lat=grid_lat, grid="octahedral", mesh_refinements=refinements
    )
    log(f"graph built in {time.time() - t0:.0f}s; saving to {path}")
    g.save(path)
    return g


def make_model(graph, *, channels: int, layers: int, heads: int, n_vars: int,
               num_chunks: int = 2, layer_scan: bool = False):
    """AIFS-recipe GraphTransformer enc-proc-dec at the given width."""
    import jax.numpy as jnp

    from anemoi_models_tpu.data_indices import IndexCollection
    from anemoi_models_tpu.models import AnemoiModelEncProcDec
    from anemoi_models_tpu.utils import DotDict

    names = [f"v{i:03d}" for i in range(n_vars)]
    name_to_index = {n: i for i, n in enumerate(names)}
    forcing = names[: min(4, n_vars // 8 + 1)]
    diagnostic = names[-min(3, n_vars // 8 + 1):]
    edge_attrs = ["edge_length", "edge_dirs"]
    cfg = DotDict(
        {
            "data": {"forcing": forcing, "diagnostic": diagnostic, "processors": {}},
            "graph": {"data": "data", "hidden": "hidden"},
            "training": {"multistep_input": 2},
            "model": {
                "num_channels": channels,
                "trainable_parameters": {"hidden": 8},
                "model": {
                    "_target_": "anemoi.models.models.encoder_processor_decoder.AnemoiModelEncProcDec"
                },
                "encoder": {
                    "_target_": "anemoi.models.layers.mapper.GraphTransformerForwardMapper",
                    "num_heads": heads, "trainable_size": 4, "num_chunks": num_chunks,
                    "sub_graph_edge_attributes": edge_attrs,
                },
                "processor": {
                    "_target_": "anemoi.models.layers.processor.GraphTransformerProcessor",
                    "num_layers": layers, "num_chunks": max(layers // 2, 1),
                    "num_heads": heads, "trainable_size": 4,
                    "remat_policy": "full", "layer_scan": layer_scan,
                    "sub_graph_edge_attributes": edge_attrs,
                },
                "decoder": {
                    "_target_": "anemoi.models.layers.mapper.GraphTransformerBackwardMapper",
                    "num_heads": heads, "trainable_size": 4, "num_chunks": num_chunks,
                    "sub_graph_edge_attributes": edge_attrs,
                },
            },
        }
    )
    indices = IndexCollection(cfg, name_to_index)
    model = AnemoiModelEncProcDec(
        model_config=cfg, data_indices=indices, graph_data=graph, dtype=jnp.bfloat16
    )
    return model, indices


def audit_collectives(hlo_text: str, full_node_elems: int) -> dict:
    """Largest collective operand (elements) per op kind.

    The forbidden object is a full DATA-GRID tensor at hidden width
    (n_grid × C — the thing that cannot fit one chip, and what the
    reference's design all-gathers per GNN block, ``block.py:203``). The
    decoder's single narrow-source all-gather (n_mesh × C) and the
    encoder's raw-row gather (n_grid × ~20) are by design and far smaller;
    gradient all-reduces are excluded."""
    biggest: dict[str, int] = {}
    pat = re.compile(r"=\s+(?:\()?[a-z0-9]+\[([0-9,]*)\]")
    for line in hlo_text.splitlines():
        for kind in ("all-gather", "all-reduce", "all-to-all", "collective-permute",
                     "reduce-scatter"):
            if f" {kind}(" in line or f" {kind}-start(" in line:
                m = pat.search(line)
                if m:
                    dims = [int(d) for d in m.group(1).split(",") if d]
                    elems = int(np.prod(dims)) if dims else 1
                    biggest[kind] = max(biggest.get(kind, 0), elems)
    ok = all(v < full_node_elems for k, v in biggest.items() if k != "all-reduce")
    return {"largest_by_kind": biggest, "full_node_elems": full_node_elems, "ok": ok}


def _shaped(tree, sharding):
    import jax

    return jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding), tree
    )


def leg_run(args) -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from anemoi_models_tpu.parallel import make_mesh, use_mesh
    from anemoi_models_tpu.training import make_train_step

    assert jax.default_backend() == "cpu", (
        "the executed leg emulates the mesh on CPU devices; run with "
        "JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    n_dev = jax.device_count()
    graph = load_or_build_graph(args.grid_lat, args.refinements)
    n_grid = graph["data"].num_nodes
    n_mesh = graph["hidden"].num_nodes
    log(f"geometry: grid={n_grid:,} mesh={n_mesh:,} "
        f"enc={graph[('data', 'to', 'hidden')].num_edges:,} "
        f"proc={graph[('hidden', 'to', 'hidden')].num_edges:,} "
        f"dec={graph[('hidden', 'to', 'data')].num_edges:,} edges; rss={rss_gb():.1f}GB")

    model, indices = make_model(
        graph, channels=args.channels, layers=args.layers, heads=args.heads,
        n_vars=args.vars, num_chunks=args.mapper_chunks,
    )
    n_in = len(indices.internal_model.input)
    n_out = len(indices.internal_model.output)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 1, n_grid, n_in), jnp.float32)
    y = jnp.zeros((1, 1, n_grid, n_out), jnp.float32)

    mesh = make_mesh(data=1, model=n_dev)
    batch_spec = NamedSharding(mesh, P(None, None, None, "model", None))
    target_spec = NamedSharding(mesh, P(None, None, "model", None))
    replicated = NamedSharding(mesh, P())

    optimizer = optax.adam(1e-4)
    init_state, train_step = make_train_step(model, optimizer)
    report: dict = {"geometry": {"grid": n_grid, "mesh": n_mesh},
                    "channels": args.channels, "layers": args.layers,
                    "devices": n_dev}

    with use_mesh(mesh):
        x = jax.device_put(x, batch_spec)
        y = jax.device_put(y, target_spec)
        t0 = time.time()
        state = jax.jit(init_state, out_shardings=replicated)(jax.random.key(0), x)
        jax.block_until_ready(state.params)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params))
        log(f"init: {time.time() - t0:.0f}s, {n_params:,} params; rss={rss_gb():.1f}GB")
        report["params"] = n_params

        fwd = jax.jit(model.apply, in_shardings=(replicated, batch_spec))
        t0 = time.time()
        fwd_c = fwd.lower(state.params, x).compile()
        log(f"forward compile: {time.time() - t0:.0f}s; rss={rss_gb():.1f}GB")
        t0 = time.time()
        out = fwd_c(state.params, x)
        jax.block_until_ready(out)
        t_fwd = time.time() - t0
        assert bool(jnp.isfinite(out).all()), "non-finite forward output"
        log(f"forward RUN: {t_fwd:.1f}s on the emulated mesh ({n_dev} shards on "
            f"{os.cpu_count()} cores); rss={rss_gb():.1f}GB")
        report["forward_s"] = round(t_fwd, 1)

        audit = audit_collectives(fwd_c.as_text(), n_grid * args.channels)
        log(f"forward HLO collective audit: {audit}")
        report["forward_audit"] = audit
        assert audit["ok"], "a collective moved a full node tensor"
        del out

        step = jax.jit(
            train_step,
            in_shardings=(replicated, batch_spec, target_spec),
            out_shardings=(replicated, replicated),
            donate_argnums=(0,),
        )
        t0 = time.time()
        step_c = step.lower(state, x, y).compile()
        log(f"train-step compile: {time.time() - t0:.0f}s; rss={rss_gb():.1f}GB")
        t0 = time.time()
        state, loss = step_c(state, x, y)
        loss_v = float(loss)
        t_step = time.time() - t0
        assert np.isfinite(loss_v), f"non-finite loss {loss_v}"
        log(f"train step RUN: {t_step:.1f}s, loss={loss_v:.4f}; rss={rss_gb():.1f}GB")
        report["train_step_s"] = round(t_step, 1)
        report["loss"] = loss_v

        audit = audit_collectives(step_c.as_text(), n_grid * args.channels)
        log(f"train-step HLO collective audit: {audit}")
        report["train_audit"] = audit
        assert audit["ok"], "a collective moved a full node tensor"

    report["peak_rss_gb"] = round(rss_gb(), 1)
    _write_report(args, "run", report)


def leg_budget(args) -> None:
    import jax
    import jax.numpy as jnp
    import optax
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from anemoi_models_tpu.parallel import use_mesh
    from anemoi_models_tpu.training import make_train_step

    topo = topologies.get_topology_desc(platform="tpu", topology_name=args.topology)
    devices = np.array(topo.devices).reshape(1, -1)
    n_dev = devices.size
    mesh = Mesh(devices, ("data", "model"))
    log(f"AOT target: {args.topology} ({n_dev} chips), HBM/chip = {args.hbm_gb} GB")

    graph = load_or_build_graph(args.grid_lat, args.refinements)
    n_grid = graph["data"].num_nodes
    n_mesh = graph["hidden"].num_nodes

    results = []
    for spec in args.budget.split(","):
        channels, layers = (int(v) for v in spec.split(":"))
        log(f"--- C={channels} L={layers} vars={args.vars} bf16 ---")
        model, indices = make_model(
            graph, channels=channels, layers=layers, heads=args.heads, n_vars=args.vars,
            num_chunks=args.mapper_chunks, layer_scan=bool(args.layer_scan),
        )
        n_in = len(indices.internal_model.input)
        n_out = len(indices.internal_model.output)

        batch_spec = NamedSharding(mesh, P(None, None, None, "model", None))
        target_spec = NamedSharding(mesh, P(None, None, "model", None))
        replicated = NamedSharding(mesh, P())
        x_s = jax.ShapeDtypeStruct((1, 2, 1, n_grid, n_in), jnp.float32, sharding=batch_spec)
        y_s = jax.ShapeDtypeStruct((1, 1, n_grid, n_out), jnp.float32, sharding=target_spec)

        optimizer = optax.adam(1e-4)
        init_state, train_step = make_train_step(model, optimizer)
        with use_mesh(mesh):
            t0 = time.time()
            state_shape = jax.eval_shape(init_state, jax.random.key(0), x_s)
            if args.param_sharding:
                # ZeRO-1 / FSDP over the model axis (parallel/fsdp.py): the
                # compiler prices sharded moments (and under fsdp, sharded
                # params + use-site weight all-gathers) directly
                from anemoi_models_tpu.parallel.fsdp import train_state_shardings

                state_sharding = train_state_shardings(
                    state_shape, mesh, mode=args.param_sharding, axis="model"
                )
            else:
                state_sharding = None
            n_params = sum(
                int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state_shape.params)
            )
            param_bytes = sum(
                int(np.prod(p.shape)) * p.dtype.itemsize
                for p in jax.tree_util.tree_leaves(state_shape.params)
            )
            opt_bytes = sum(
                int(np.prod(p.shape)) * p.dtype.itemsize
                for p in jax.tree_util.tree_leaves(state_shape.opt_state)
            )
            log(f"params: {n_params:,} ({param_bytes / 2**30:.2f} GiB), adam state "
                f"{opt_bytes / 2**30:.2f} GiB (trace {time.time() - t0:.0f}s)")
            if state_sharding is not None:
                state_s = jax.tree_util.tree_map(
                    lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
                    state_shape, state_sharding,
                )
                params_in = jax.tree_util.tree_map(
                    lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
                    state_shape.params, state_sharding.params,
                )
                state_out_sh = state_sharding
            else:
                state_s = _shaped(state_shape, replicated)
                params_in = state_s.params
                state_out_sh = replicated

            row = {
                "channels": channels, "layers": layers, "vars": args.vars,
                "params": n_params, "param_gib": round(param_bytes / 2**30, 2),
                "adam_gib": round(opt_bytes / 2**30, 2),
                "param_sharding": args.param_sharding,
                "mapper_chunks": args.mapper_chunks,
            }
            programs = {
                "forward": lambda: (
                    model.apply,
                    dict(in_shardings=(None, batch_spec)),
                    (params_in, x_s),
                ),
                "train_step": lambda: (
                    train_step,
                    dict(in_shardings=(None, batch_spec, target_spec),
                         out_shardings=(state_out_sh, replicated), donate_argnums=(0,)),
                    (state_s, x_s, y_s),
                ),
            }
            for name in args.programs.split(","):
                f, jkw, fn_args = programs[name]()
                if args.hoist:
                    # program-size lever: graph tables leave the HLO as
                    # literals and enter as runtime arguments (utils/hoist.py)
                    from anemoi_models_tpu.utils import hoist_constants

                    t0 = time.time()
                    f, consts = hoist_constants(f, *fn_args)
                    const_gib = sum(
                        int(np.prod(np.shape(c) or (1,))) * np.dtype(c.dtype).itemsize
                        for c in consts
                    ) / 2**30
                    log(f"{name}: hoisted {len(consts)} consts "
                        f"({const_gib:.2f} GiB) in {time.time() - t0:.0f}s; "
                        f"rss={rss_gb():.1f}GB")
                    row[f"{name}_hoisted_gib"] = round(const_gib, 2)
                    # per-shard stacked tables (leading dim == model-axis
                    # size) can live sharded: each chip then holds only its
                    # shard's slice instead of a replicated copy. Safe even
                    # on a false positive (GSPMD reshards; numerics
                    # unchanged) — this is purely an HBM-residency choice.
                    n_model = int(mesh.shape["model"])
                    def _const_sharding(shape):
                        if args.shard_tables and len(shape) >= 1 and shape[0] == n_model:
                            return NamedSharding(
                                mesh, P(*(("model",) + (None,) * (len(shape) - 1)))
                            )
                        return replicated
                    consts_s = [
                        jax.ShapeDtypeStruct(np.shape(c), c.dtype,
                                             sharding=_const_sharding(np.shape(c)))
                        for c in consts
                    ]
                    jkw = dict(jkw)
                    if jkw.get("in_shardings") is not None:
                        jkw["in_shardings"] = (None,) + tuple(jkw["in_shardings"])
                    if "donate_argnums" in jkw:
                        jkw["donate_argnums"] = tuple(i + 1 for i in jkw["donate_argnums"])
                    fn_args = (consts_s,) + tuple(fn_args)
                fn = jax.jit(f, **jkw)
                t0 = time.time()
                compiled = fn.lower(*fn_args).compile()
                ma = compiled.memory_analysis()
                per_chip = {
                    "argument_gib": round(ma.argument_size_in_bytes / 2**30, 2),
                    "output_gib": round(ma.output_size_in_bytes / 2**30, 2),
                    "temp_gib": round(ma.temp_size_in_bytes / 2**30, 2),
                    "alias_gib": round(ma.alias_size_in_bytes / 2**30, 2),
                }
                # live peak: arguments + outputs + temps coexist (aliased
                # donated buffers counted once)
                total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                         + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
                per_chip["peak_gib"] = round(total / 2**30, 2)
                per_chip["fits_hbm"] = total < args.hbm_gb * 2**30
                log(f"{name}: compiled in {time.time() - t0:.0f}s -> per-chip {per_chip}")
                row[name] = per_chip
                audit = audit_collectives(compiled.as_text(), n_grid * channels)
                log(f"{name} collective audit: {audit}")
                row[f"{name}_audit_ok"] = audit["ok"]
                del compiled
                import gc

                gc.collect()
            results.append(row)

    tag = "budget" if args.programs == "forward,train_step" else f"budget_{args.programs.replace(',', '_')}"
    if args.param_sharding:
        tag += f"_{args.param_sharding}"
    if args.mapper_chunks != 2:
        tag += f"_mc{args.mapper_chunks}"
    if args.hoist:
        tag += "_hoist"
    if args.layer_scan:
        tag += "_scan"
    if args.shard_tables:
        tag += "_st"
    _write_report(args, tag, {"topology": args.topology, "hbm_gb": args.hbm_gb,
                              "geometry": {"grid": n_grid, "mesh": n_mesh},
                              "rows": results})


def _write_report(args, leg: str, payload: dict) -> None:
    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"o{args.grid_lat}_{leg}_report.json")
    with open(path, "w") as f:
        json.dump(payload, f, indent=2)
    log(f"report written to {path}")
    print(json.dumps(payload))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--leg", choices=("run", "budget", "graph"), default="run")
    p.add_argument("--grid-lat", type=int, default=1280)
    p.add_argument("--refinements", type=int, default=8)
    p.add_argument("--channels", type=int, default=64)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--heads", type=int, default=16)
    p.add_argument("--vars", type=int, default=8)
    p.add_argument("--budget", default="512:16,1024:16",
                   help="comma list of channels:layers points for the budget leg")
    p.add_argument("--topology", default="v5p:2x2x2")
    p.add_argument("--param-sharding", choices=("zero1", "fsdp"), default=None,
                   help="shard optimizer state (zero1) or params+state (fsdp) "
                        "over the model axis in the budget leg")
    p.add_argument("--mapper-chunks", type=int, default=2,
                   help="dst-row chunks in the sharded mappers (bounds the "
                        "k/v/edge slot slabs, the dominant HBM term at scale)")
    p.add_argument("--programs", default="forward,train_step",
                   help="which programs to AOT-compile in this process (the "
                        "train-step lowering of the 61.7M-edge model peaks "
                        ">100GB host RAM; run one program per invocation at "
                        "production widths)")
    p.add_argument("--hbm-gb", type=float, default=95.0)
    p.add_argument("--shard-tables", type=int, default=0,
                   help="shard hoisted per-shard-stacked tables (leading dim "
                        "== model-axis size) over the model axis instead of "
                        "replicating them")
    p.add_argument("--layer-scan", type=int, default=0,
                   help="nn.scan-stacked processor layers (program size "
                        "independent of depth; scan-averse on the tunneled "
                        "dev chip, fine on real TPUs)")
    p.add_argument("--hoist", type=int, default=1,
                   help="hoist graph-table constants into runtime arguments "
                        "before lowering (the O1280 partitioner-memory lever)")
    args = p.parse_args()
    if args.leg == "graph":
        load_or_build_graph(args.grid_lat, args.refinements)
    elif args.leg == "run":
        leg_run(args)
    else:
        leg_budget(args)


if __name__ == "__main__":
    main()
