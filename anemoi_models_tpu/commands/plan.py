"""Kernel-plan inspection command: coverage/slab statistics for a graph."""

from __future__ import annotations

from anemoi_models_tpu.commands import register_command


@register_command("plan")
class Plan:
    """Show the slot-kernel layout a graph would get (coverage, slabs,
    outliers) — the static side of ``graph_impl="pallas"``."""

    def add_arguments(self, parser) -> None:
        parser.add_argument("--grid-lat", type=int, default=96)
        parser.add_argument("--grid", default="octahedral", choices=["octahedral", "latlon"])
        parser.add_argument("--refinements", type=int, default=5)
        parser.add_argument("--block-nodes", type=int, default=128)
        parser.add_argument("--cap", type=int, default=8)
        parser.add_argument("--slab", type=int, default=0, help="0 = auto-select")
        parser.add_argument(
            "--shards", type=int, default=0,
            help="also show the per-shard halo plans for this model-axis size",
        )

    def run(self, args) -> int:
        from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
        from anemoi_models_tpu.graphs.kernel_plan import edge_set_kernel_plan

        g = build_enc_proc_dec_graph(
            grid_lat=args.grid_lat, grid=args.grid, mesh_refinements=args.refinements
        )
        for key in g.edges:
            es = g[key]
            num_dst = g[key[2]].num_nodes
            num_src = g[key[0]].num_nodes
            plan = edge_set_kernel_plan(
                es, num_dst, num_src,
                block_nodes=args.block_nodes, cap=args.cap, slab_width=args.slab,
            )
            print(
                f"{key[0]}->{key[2]}: edges={es.num_edges} blocks={plan.num_blocks} "
                f"cap={plan.cap} slab={plan.slab_width} coverage={plan.coverage:.1%} "
                f"outliers={len(plan.outlier_src)}"
            )
            if args.shards > 1 and key[0] == key[2]:  # halo plans need a self-graph
                from anemoi_models_tpu.graphs.kernel_plan import build_halo_kernel_plans
                from anemoi_models_tpu.graphs.partition import partition_1hop

                part = partition_1hop(es.edge_index, num_dst, args.shards)
                sp = build_halo_kernel_plans(
                    part, block_nodes=args.block_nodes, cap=args.cap,
                    slab_width=args.slab,
                )
                halo = part.halo_mask.sum(axis=1)
                print(
                    f"  halo x{args.shards}: nodes/shard={sp.nodes_per_shard} "
                    f"blocks/shard={sp.num_blocks} slab={sp.slab_width} "
                    f"coverage={sp.coverage:.1%} "
                    f"halo-rows min/max={int(halo.min())}/{int(halo.max())} "
                    f"outliers/shard={sp.out_src.shape[1]}"
                )
        return 0
