"""Build-time layout plan for the fused Pallas edge-attention kernel.

The kernel (``ops/pallas/edge_attention.py``) processes destination nodes in
static blocks of ``block_nodes`` rows. For each block it DMAs one contiguous
``slab_width``-row window of the source k/v tensors into VMEM and gathers
neighbor rows from that window with one-hot matmuls on the MXU (Mosaic cannot
vector-gather in VMEM, but it multiplies matrices just fine). That only works
for edges whose source happens to fall inside the block's window — guaranteed
for the 1-ring of a bandwidth-minimized (RCM-ordered) mesh, structurally false
for the long-range multiscale levels. Edges that don't fit (out-of-window
source or per-node degree beyond ``cap``) are *outliers*: the model runs them
through the plain XLA segment path and merges the two attention partials
exactly (see ``ops/slot_attention.py:merge_partials``).

Everything here is host-side numpy at model-build time; arrays are baked into
the jitted program as constants. Replaces the role the reference's 1-hop edge
sorting plays for its distributed GNN (``distributed/khop_edges.py:50-130``)
— except the re-layout here feeds a kernel, not a process group.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

__all__ = [
    "EdgeKernelPlan",
    "HaloBucketedTables",
    "HaloGNNTables",
    "MultiPassPlan",
    "ShardedKernelPlan",
    "build_edge_kernel_plan",
    "build_halo_bucketed_tables",
    "build_halo_gnn_tables",
    "build_halo_kernel_plans",
    "build_multi_pass_plan",
    "edge_set_kernel_plan",
    "plan_cost",
]


@dataclass(eq=False)  # identity hash: usable as static jit metadata
class EdgeKernelPlan:
    """Static layout for one edge set. N = num_dst padded to block_nodes,
    R = N * cap flattened (node, slot) rows."""

    num_dst: int  # true destination count (pre-padding)
    num_src: int
    block_nodes: int  # destinations per kernel block
    cap: int  # neighbor slots per destination (multiple of 8)
    slab_width: int  # source rows DMA'd per block (multiple of 8)
    slab_start: np.ndarray  # (num_blocks,) int32, clamped to [0, num_src - slab_width]
    src_slab_idx: np.ndarray  # (R, 1) int32 — slab-local source row per slot
    slot_mask: np.ndarray  # (R, 1) float32 — 1 for live slots, 0 for padding
    edge_ids: np.ndarray  # (R,) int32 — global edge id per slot (0 where padded)
    outlier_src: np.ndarray  # (E_out,) int32
    outlier_dst: np.ndarray  # (E_out,) int32
    outlier_edge_ids: np.ndarray  # (E_out,) int32
    # transpose-adjoint layout (gather-only backward, see
    # graphs/partition.py:transpose_position_tables)
    t_src: tuple = None  # (buckets, reassemble) over slot positions per source row
    slot_of_edge: np.ndarray = None  # (E,) int32 slot of each edge, -1 if outlier
    t_out_src: tuple = None  # transpose tables over outlier positions per source
    t_out_dst: tuple = None  # same, per destination
    out_pos_of_edge: np.ndarray = None  # (E,) int32 outlier position, -1 if slotted
    out_tables: tuple = None  # (buckets, reassemble) over the outlier edge list
    out_transpose: dict = None  # transpose bundle for the outlier buckets

    @property
    def num_blocks(self) -> int:
        return len(self.slab_start)

    @property
    def padded_dst(self) -> int:
        return self.num_blocks * self.block_nodes

    @property
    def coverage(self) -> float:
        """Fraction of edges handled in-kernel."""
        total = int(self.slot_mask.sum()) + len(self.outlier_src)
        return float(self.slot_mask.sum()) / max(total, 1)


# Outlier weight (slot-units per COO edge) of the plan cost model. Originally
# fitted from the round-2 O96 slab sweep (384 → 1,094k, 256 → 1,062k,
# 512 → 970k pts/s, same session; solve t = a·R·W + b·E_out + c, κ = b/a);
# round-5 re-validation against the on-chip multipass A/Bs
# (examples/kappa_fit.py) turns every measured ordering into a bound:
#   κ > 839 (r5 slab 384 beats 256),  κ < 1089 (r6 1 pass beats 2),
#   κ < 1701 (r5 1 pass beats 2),     κ < 2383 (r5 1 pass beats 3).
# κ = 936 sits inside the admissible band, so auto-pass selection prefers a
# single pass at r5 AND r6 *from the model* — the round-4 mis-prediction was
# the fixed-width extrapolation, not κ. (The r5 "p3 < p2" on-chip ordering
# needs κ > 3978 and is unreachable by any single κ — a fixed-cost COO-path
# term the linear model omits; harmless for greedy auto, which stops at the
# first pass that does not pay and never reaches p3.)
PLAN_KAPPA = 936.0


def plan_cost(plan) -> float:
    """Relative on-chip cost of running a plan: slot one-hot gather work
    (∝ slot rows × slab width) plus the κ-weighted outlier segment path
    (:data:`PLAN_KAPPA` — fit + validation bounds documented there).

    A :class:`MultiPassPlan` costs the sum of its passes' slot terms plus
    the final residual's outlier term.
    """
    if isinstance(plan, MultiPassPlan):
        slot = sum(float(p.padded_dst * p.cap) * p.slab_width for p in plan.plans)
        return slot + PLAN_KAPPA * len(plan.plans[-1].outlier_src)
    rows = plan.padded_dst * plan.cap
    return float(rows) * plan.slab_width + PLAN_KAPPA * len(plan.outlier_src)


def _select_plan(candidates: dict) -> "EdgeKernelPlan":
    """Auto-select among per-width plans: argmin modeled cost, or best
    coverage (smallest width within 1%) with ANEMOI_PLAN_SELECT=coverage."""
    import os

    if os.environ.get("ANEMOI_PLAN_SELECT", "cost") == "coverage":
        best = max(p.coverage for p in candidates.values())
        return next(p for p in candidates.values() if p.coverage >= best - 0.01)
    return min(candidates.values(), key=plan_cost)


@dataclass(eq=False)  # identity hash: static jit metadata, like EdgeKernelPlan
class MultiPassPlan:
    """Multi-window slot layout: a chain of :class:`EdgeKernelPlan` passes
    over one edge set, each pass planned on the previous pass's outliers.

    Why: the single-window kernel's coverage is bounded by the RCM bandwidth
    of the mesh, which grows ~sqrt(nodes) — at refinement 8 a 1024-row slab
    catches only ~42% of processor edges (PERF.md "Scale audit: O1280").
    A K·W-wide single window would recover coverage but pays K·W-wide
    one-hot gather FLOPs *per slot* and K× the VMEM. K separate W-wide
    passes keep per-slot one-hot cost at W (each pass's slots gather only
    from that pass's slab) while the union of windows tracks the multiscale
    edge structure — the attention softmax splits exactly across passes via
    the merge-form partials (``ops/slot_attention.merge_partials``), the
    same mechanism that already folds in the outlier COO path.

    Every plan's edge ids are in the GLOBAL edge space (``_globalize_plan``),
    so per-pass slot attributes gather straight from the raw edge-attr
    tensor. Only the LAST pass carries outlier execution tables; earlier
    passes' outliers exist only as the next pass's input.
    """

    plans: tuple  # tuple[EdgeKernelPlan], len >= 2; plans[-1] owns outliers
    num_dst: int
    num_src: int

    @property
    def coverage(self) -> float:
        """Fraction of edges handled in-kernel across all passes."""
        slot = sum(float(p.slot_mask.sum()) for p in self.plans)
        total = slot + len(self.plans[-1].outlier_src)
        return slot / max(total, 1.0)

    @property
    def pass_coverage(self) -> list:
        """Per-pass fraction of the total edge set (diagnostics)."""
        total = sum(float(p.slot_mask.sum()) for p in self.plans) + len(
            self.plans[-1].outlier_src
        )
        return [float(p.slot_mask.sum()) / max(total, 1.0) for p in self.plans]


def _globalize_plan(plan: EdgeKernelPlan, gids: np.ndarray, e_total: int) -> EdgeKernelPlan:
    """Remap a plan built on an edge *subset* into the global edge-id space.

    ``gids`` maps subset edge positions -> global edge ids. Position-space
    tables (t_src, t_out_*, out_tables/out_transpose) are untouched — they
    index rows and slot/outlier positions, not edge ids.
    """
    gids = np.asarray(gids, dtype=np.int32)
    plan.edge_ids = gids[plan.edge_ids]
    plan.outlier_edge_ids = gids[plan.outlier_edge_ids]
    sub_slot = plan.slot_of_edge
    plan.slot_of_edge = np.full(e_total, -1, dtype=np.int32)
    plan.slot_of_edge[gids] = sub_slot
    if plan.out_pos_of_edge is not None:
        sub_out = plan.out_pos_of_edge
        plan.out_pos_of_edge = np.full(e_total, -1, dtype=np.int32)
        plan.out_pos_of_edge[gids] = sub_out
    return plan


def build_multi_pass_plan(
    edge_index: np.ndarray,
    num_dst: int,
    num_src: int,
    *,
    block_nodes: int = 128,
    cap: int = 8,
    slab_width: int = 0,
    passes: int = 2,
):
    """Chain up to ``passes`` kernel plans, each over the previous outliers.

    ``slab_width=0`` auto-selects per pass by the fitted cost model
    (:func:`plan_cost`) — residual passes see progressively sparser edge
    sets and typically pick different widths. Stops early when a pass
    leaves no outliers. Returns a plain :class:`EdgeKernelPlan` when only
    one pass materializes (so ``passes=1`` is byte-identical to today's
    single-window path).

    ``passes=-1`` ("auto") adds passes greedily while each one lowers the
    modeled total cost — a pass earns its place when the slot work it adds
    is cheaper than the κ-weighted outliers it removes — capped at 4
    passes. Measured sweeps (examples/multipass_coverage.py): at
    refinement 5 the residual is too sparse and auto stays at 1 pass; at
    refinement 6+ an extra 512-wide pass costs less than the outliers it
    absorbs.
    """
    edge_index = np.asarray(edge_index)
    e_total = edge_index.shape[1]
    auto = passes < 0
    max_passes = 4 if auto else passes

    def build(ei, width: int, adjoints: bool) -> EdgeKernelPlan:
        return build_edge_kernel_plan(
            ei, num_dst, num_src,
            block_nodes=block_nodes, cap=cap, slab_width=width,
            outlier_adjoints=adjoints,
        )

    # phase 1: chain passes without outlier adjoints (cheap)
    chain: list[tuple] = []  # (plan, input_ei, input_gids)
    ei, gids = edge_index, np.arange(e_total, dtype=np.int64)
    slot_cost = 0.0
    prev_total = None
    for _ in range(max_passes):
        if slab_width:
            plan = build(ei, slab_width, False)
        else:
            plan = _select_plan({
                w: build(ei, w, False) for w in (256, 384, 512, 768, 1024, 1536)
            })
        if auto:
            total = (
                slot_cost
                + float(plan.padded_dst * plan.cap) * plan.slab_width
                + PLAN_KAPPA * len(plan.outlier_src)
            )
            if prev_total is not None and total >= prev_total:
                break  # this pass does not pay for itself
            prev_total = total
        chain.append((plan, ei, gids))
        if len(plan.outlier_src) == 0:
            break
        slot_cost += float(plan.padded_dst * plan.cap) * plan.slab_width
        ei = np.stack([plan.outlier_src, plan.outlier_dst]).astype(np.int64)
        gids = gids[plan.outlier_edge_ids]

    # phase 2: the final pass's outliers execute (COO/bucketed path) —
    # rebuild it with the outlier adjoint tables
    last_plan, last_ei, last_gids = chain[-1]
    if len(last_plan.outlier_src):
        last_plan = build(last_ei, last_plan.slab_width, True)
        chain[-1] = (last_plan, last_ei, last_gids)

    plans = tuple(_globalize_plan(p, g, e_total) for p, _, g in chain)
    if len(plans) == 1:
        return plans[0]
    return MultiPassPlan(plans=plans, num_dst=num_dst, num_src=num_src)


def _best_window(sorted_src: np.ndarray, num_src: int, width: int) -> int:
    """Start of the width-wide window containing the most sources."""
    if sorted_src.size == 0:
        return 0
    lo = np.searchsorted(sorted_src, sorted_src - width + 1, side="left")
    best = int(np.argmax(np.arange(1, len(sorted_src) + 1) - lo))
    start = int(sorted_src[best]) - width + 1
    # slide left edge down to the window's actual smallest member
    start = max(int(sorted_src[lo[best]]), start)
    start = int(np.clip(start, 0, max(num_src - width, 0)))
    # sublane-tile alignment: Mosaic requires DMA slice starts divisible by 8
    return (start // 8) * 8


def build_edge_kernel_plan(
    edge_index: np.ndarray,
    num_dst: int,
    num_src: int,
    *,
    block_nodes: int = 128,
    cap: int = 8,
    slab_width: int = 512,
    outlier_adjoints: bool = True,
) -> EdgeKernelPlan:
    """Lay out a CSR-sorted edge set for the fused kernel.

    Per destination block the ``slab_width`` window is chosen to maximize
    in-window edge count; per destination, up to ``cap`` in-window edges get
    slots and the rest spill to the outlier COO list.

    ``outlier_adjoints=False`` skips building the outlier-path execution
    tables (transpose adjoints, bucketed layouts) — used for the
    intermediate passes of :func:`build_multi_pass_plan`, whose outliers
    only feed the next pass's plan and never execute.
    """
    assert cap % 8 == 0, "cap must be a multiple of 8 (sublane tile regrouping)"
    assert slab_width % 8 == 0, "slab_width must be a multiple of 8"
    src, dst = np.asarray(edge_index, dtype=np.int64)
    assert np.all(np.diff(dst) >= 0), "edge_index must be CSR-sorted by destination"
    slab_width = min(slab_width, max(8, -(-num_src // 8) * 8))

    num_blocks = -(-num_dst // block_nodes)
    padded_dst = num_blocks * block_nodes
    rows = padded_dst * cap

    starts = np.searchsorted(dst, np.arange(0, padded_dst + block_nodes, block_nodes))
    all_eids = np.arange(len(src), dtype=np.int64)

    from anemoi_models_tpu import native

    got = native.kernel_plan_slots(
        src, dst, num_dst, num_src, block_nodes, cap, slab_width
    )
    if got is not None:
        # C++ core: slot assignment is bit-exact; the spill codes reproduce
        # the numpy per-block order (overflow first, then out-of-window)
        slab_start, src_slab_idx, slot_mask, edge_ids, code = got
        src_slab_idx = src_slab_idx[:, None]
        slot_mask = slot_mask[:, None]
        # Spilled edges, ordered per block as (overflow first, then
        # out-of-window), each group in edge order — one lexsort reproduces
        # the per-block concatenation the loop used to build (the later
        # stable dst-sort makes only the within-destination order
        # observable, and block > dst > code > eid preserves it exactly).
        sp = np.nonzero(code > 0)[0]
        if sp.size:
            blk = np.searchsorted(starts, sp, side="right") - 1
            order = np.lexsort((sp, code[sp] == 1, blk))
            spill = sp[order]
            out_src = [src[spill]]
            out_dst = [dst[spill]]
            out_eid = [all_eids[spill]]
        else:
            out_src, out_dst, out_eid = [], [], []
    else:
        slab_start = np.zeros(num_blocks, dtype=np.int32)
        src_slab_idx = np.zeros((rows, 1), dtype=np.int32)
        slot_mask = np.zeros((rows, 1), dtype=np.float32)
        edge_ids = np.zeros(rows, dtype=np.int32)
        out_src = []
        out_dst = []
        out_eid = []

        for b in range(num_blocks):
            e0, e1 = starts[b], starts[b + 1]
            bsrc, bdst, beid = src[e0:e1], dst[e0:e1], all_eids[e0:e1]
            start = _best_window(np.sort(bsrc), num_src, slab_width)
            slab_start[b] = start
            inside = (bsrc >= start) & (bsrc < start + slab_width)

            # slot position of each in-window edge within its destination
            bsel = np.nonzero(inside)[0]
            dsel = bdst[bsel]
            # stable order keeps CSR edge order within each destination
            pos = np.zeros(len(bsel), dtype=np.int64)
            uniq, first_idx, counts = np.unique(dsel, return_index=True, return_counts=True)
            for u_i, (d0, c) in enumerate(zip(first_idx, counts)):
                pos[d0 : d0 + c] = np.arange(c)
            fits = pos < cap
            take = bsel[fits]
            r = dsel[fits] * cap + pos[fits]
            src_slab_idx[r, 0] = (bsrc[take] - start).astype(np.int32)
            slot_mask[r, 0] = 1.0
            edge_ids[r] = beid[take].astype(np.int32)

            spill = np.concatenate([bsel[~fits], np.nonzero(~inside)[0]])
            if spill.size:
                out_src.append(bsrc[spill])
                out_dst.append(bdst[spill])
                out_eid.append(beid[spill])

    cat = lambda xs: (  # noqa: E731
        np.concatenate(xs).astype(np.int32) if xs else np.zeros(0, dtype=np.int32)
    )
    o_src, o_dst, o_eid = cat(out_src), cat(out_dst), cat(out_eid)
    order = np.argsort(o_dst, kind="stable")  # CSR-sort for the segment ops
    o_src, o_dst, o_eid = o_src[order], o_dst[order], o_eid[order]

    from anemoi_models_tpu.graphs.partition import transpose_position_tables

    block_of_row = np.arange(rows) // (block_nodes * cap)
    gsrc = slab_start.astype(np.int64)[block_of_row] + src_slab_idx[:, 0]
    t_src = transpose_position_tables(
        np.where(slot_mask[:, 0] > 0, gsrc, -1), num_src
    )
    slot_of_edge = np.full(len(src), -1, dtype=np.int32)
    live = np.nonzero(slot_mask[:, 0])[0]
    slot_of_edge[edge_ids[live]] = live.astype(np.int32)
    t_out_src = t_out_dst = out_pos_of_edge = None
    out_tables = out_transpose = None
    if outlier_adjoints:
        t_out_src = transpose_position_tables(o_src.astype(np.int64), num_src)
        t_out_dst = transpose_position_tables(o_dst.astype(np.int64), num_dst)
        out_pos_of_edge = np.full(len(src), -1, dtype=np.int32)
        out_pos_of_edge[o_eid] = np.arange(len(o_eid), dtype=np.int32)

        if len(o_src):
            from anemoi_models_tpu.graphs.partition import (
                bucketed_neighbor_tables,
                bucketed_transpose_bundle,
            )

            out_ei = np.stack([o_src, o_dst]).astype(np.int64)
            out_buckets, out_reassemble = bucketed_neighbor_tables(out_ei, num_dst)
            out_tables = (out_buckets, out_reassemble)
            out_transpose = bucketed_transpose_bundle(out_buckets, num_dst, num_src, len(o_src))
    return EdgeKernelPlan(
        num_dst=num_dst,
        num_src=num_src,
        block_nodes=block_nodes,
        cap=cap,
        slab_width=slab_width,
        slab_start=slab_start,
        src_slab_idx=src_slab_idx,
        slot_mask=slot_mask,
        edge_ids=edge_ids,
        outlier_src=o_src,
        outlier_dst=o_dst,
        outlier_edge_ids=o_eid,
        t_src=t_src,
        slot_of_edge=slot_of_edge,
        t_out_src=t_out_src,
        t_out_dst=t_out_dst,
        out_pos_of_edge=out_pos_of_edge,
        out_tables=out_tables,
        out_transpose=out_transpose,
    )


@dataclass(eq=False)  # identity hash: static jit metadata, like EdgeKernelPlan
class ShardedKernelPlan:
    """Per-shard kernel plans for the halo-partitioned edge-attention path,
    stacked over the ``model`` axis so one SPMD program serves every shard.

    Sources are renumbered per shard into *contiguized* coordinates: the
    halo-extended tensor ``[local | halo]`` is permuted to global-id order
    ``[pre-halo | local | post-halo]``, which restores RCM adjacency across
    the shard boundary — the kernel's contiguous-slab assumption then holds
    exactly as on one chip, and only the long-range multiscale halo members
    spill to the per-shard outlier COO lists.

    Static dims are shared across shards (equal ``nodes_per_shard`` makes
    ``num_blocks`` equal; ``slab_width``/``cap`` are chosen globally). All
    stacked arrays lead with the shard axis S.
    """

    num_shards: int
    nodes_per_shard: int
    block_nodes: int
    cap: int
    slab_width: int
    num_blocks: int  # per shard
    ext_rows: int  # padded length of the contiguized source tensor (mult. of 8)
    num_edges: int  # global edge count; padded id slots carry this sentinel
    cont_to_ext: np.ndarray  # (S, ext_rows) int32 — cont position -> ext row
    ext_to_cont: np.ndarray  # (S, ext_rows) int32 — inverse permutation
    slab_start: np.ndarray  # (S, num_blocks) int32
    src_slab_idx: np.ndarray  # (S, R, 1) int32, R = num_blocks*block_nodes*cap
    slot_mask: np.ndarray  # (S, R, 1) float32
    edge_ids: np.ndarray  # (S, R) int32 global edge id per slot (num_edges if padded)
    out_src: np.ndarray  # (S, Eo) int32 — contiguized source row
    out_dst: np.ndarray  # (S, Eo) int32 — shard-local destination
    out_eid: np.ndarray  # (S, Eo) int32 global edge ids (num_edges if padded)
    out_mask: np.ndarray  # (S, Eo) float32
    # scatter-free adjoints for the gathers around the kernel: position of
    # each global edge in the flattened slot / outlier layouts (−1 = absent),
    # and per-shard padded transpose tables for the outlier q/k/v gathers
    slot_pos_of_edge: np.ndarray = None  # (E,) int32 into flattened (S·R)
    out_pos_of_edge: np.ndarray = None  # (E,) int32 into flattened (S·Eo)
    t_out_src: tuple = None  # ((S, ext_rows, M) int32, (S, ext_rows, M) bool)
    t_out_dst: tuple = None  # ((S, nps, Md) int32, (S, nps, Md) bool)
    # inverse tables for the halo-exchange gathers themselves (each local row
    # contributes to <=1 pool slot per shard; each pool slot feeds <=1 halo
    # row per shard), so those adjoints are masked takes too
    t_contrib: tuple = None  # ((S, nps, 1), mask)
    t_halo: tuple = None  # ((S, S*B_pad, 1), mask)
    # inverse of t_out_dst: flattened (nps*Md) slot of each outlier position
    # (−1 dead) — lets the outlier partials run destination-wise (dense
    # masked reductions, no segment scatters) with take-only adjoints
    out_slot_of_pos: np.ndarray = None  # (S, Eo) int32
    # multi-window chains (passes > 1): slab arrays gain a pass axis at
    # position 1 — slab_start (S, K, nblk), src_slab_idx/slot_mask
    # (S, K, R, 1), edge_ids (S, K, R) — with per-pass widths below.
    # K == 1 keeps the legacy single-window shapes.
    num_passes: int = 1
    slab_widths: tuple = None  # per-pass slab widths; (slab_width,) if K == 1

    @property
    def coverage(self) -> float:
        total = float(self.slot_mask.sum() + self.out_mask.sum())
        return float(self.slot_mask.sum()) / max(total, 1.0)


def _stack_padded(tabs: list, masks: list) -> tuple[np.ndarray, np.ndarray]:
    """Stack per-shard (rows, M_s) tables over the shard axis, padding M to
    the max across shards (−1 / False in the padding)."""
    m = max(t.shape[1] for t in tabs)
    tab = np.stack(
        [np.pad(t, ((0, 0), (0, m - t.shape[1])), constant_values=-1) for t in tabs]
    )
    msk = np.stack([np.pad(k, ((0, 0), (0, m - k.shape[1]))) for k in masks])
    return tab.astype(np.int32), msk


def _exchange_transpose_tables(part) -> tuple[tuple, tuple]:
    """Inverse tables for the halo-exchange gathers (contrib and select):
    each local row feeds <=1 pool slot per shard and each pool slot feeds
    <=1 halo row per shard, so both adjoints become masked takes."""
    s_count, nps = part.num_shards, part.nodes_per_shard
    b_pad = part.boundary_contrib.shape[1]
    pool_rows = s_count * b_pad
    pool_live = np.zeros(pool_rows, dtype=bool)
    pool_live[part.halo_select[part.halo_mask]] = True
    tc_tab, tc_mask, th_tab, th_mask = [], [], [], []
    for s in range(s_count):
        live = pool_live[s * b_pad + np.arange(b_pad)]
        tab, msk = _padded_transpose(np.where(live, part.boundary_contrib[s], -1), nps)
        tc_tab.append(tab)
        tc_mask.append(msk)
        tab, msk = _padded_transpose(
            np.where(part.halo_mask[s], part.halo_select[s], -1), pool_rows
        )
        th_tab.append(tab)
        th_mask.append(msk)
    return _stack_padded(tc_tab, tc_mask), _stack_padded(th_tab, th_mask)


def build_halo_kernel_plans(
    part,  # graphs.partition.HaloPartition
    *,
    block_nodes: int = 128,
    cap: int = 8,
    slab_width: int = 0,
    passes: int = 1,
) -> ShardedKernelPlan:
    """Lay out each halo shard's local subgraph for the fused kernel.

    ``part`` must carry per-shard global ``edge_ids`` (``partition_1hop``
    provides them). ``slab_width=0`` auto-selects per pass (modeled cost
    summed across shards, or mean coverage with
    ``ANEMOI_PLAN_SELECT=coverage``).

    ``passes>1`` chains multi-window passes per shard — pass k planned over
    pass k-1's residual, exactly as :func:`build_multi_pass_plan` — and the
    stacked arrays gain a pass axis: ``slab_start (S, K, nblk)``,
    ``src_slab_idx/slot_mask (S, K, R, 1)``, ``edge_ids (S, K, R)``, with
    per-pass widths in ``slab_widths``. This is what restores in-kernel
    coverage at refinement 8, where per-shard plans inherit the global RCM
    bandwidth (PERF.md: 61.7% single-window at 8 and 16 shards). With one
    pass the shapes are exactly the legacy single-window layout.
    ``passes=-1`` adds passes greedily while each lowers the summed modeled
    cost across shards (:data:`PLAN_KAPPA` rule), capped at 4.
    """
    s_count, nps = part.num_shards, part.nodes_per_shard
    h_pad = part.halo_select.shape[1]
    next_rows = nps + h_pad
    ext_rows = -(-next_rows // 8) * 8

    # contiguized order per shard: sort ext rows by global node id
    cont_to_ext = np.zeros((s_count, ext_rows), dtype=np.int32)
    ext_to_cont = np.zeros((s_count, ext_rows), dtype=np.int32)
    halo_globals = np.full((s_count, h_pad), np.iinfo(np.int64).max, dtype=np.int64)
    for s in range(s_count):
        # recover halo global ids from the pool layout: halo_select indexes the
        # flattened (S, B_pad) boundary pool; owner shard = pos // B_pad
        b_pad = part.boundary_contrib.shape[1]
        sel = part.halo_select[s]
        owner = sel // b_pad
        local_pos = part.boundary_contrib[owner, sel % b_pad]
        g = owner.astype(np.int64) * nps + local_pos
        halo_globals[s, part.halo_mask[s]] = g[part.halo_mask[s]]

        keys = np.concatenate(
            [np.arange(nps, dtype=np.int64) + s * nps, halo_globals[s]]
        )
        pad_keys = np.full(ext_rows - next_rows, np.iinfo(np.int64).max)
        order = np.argsort(np.concatenate([keys, pad_keys]), kind="stable")
        cont_to_ext[s] = order.astype(np.int32)
        ext_to_cont[s, order] = np.arange(ext_rows, dtype=np.int32)

    num_edges = int(part.edge_mask.sum())

    # per-shard residual state: (cont src, local dst) edges + global ids
    res_ei, res_gids = [], []
    for s in range(s_count):
        live = part.edge_mask[s]
        e = part.local_edges[s][live]
        src_cont = ext_to_cont[s, e[:, 0]]
        res_ei.append(np.stack([src_cont, e[:, 1]]).astype(np.int64))
        res_gids.append(part.edge_ids[s][live])

    def shard_plans(width: int) -> list[EdgeKernelPlan]:
        # per-shard outlier adjoints are never used: the sharded outlier
        # path builds its own stacked transpose tables below
        return [
            build_edge_kernel_plan(
                res_ei[s], nps, ext_rows,
                block_nodes=block_nodes, cap=cap, slab_width=width,
                outlier_adjoints=False,
            )
            for s in range(s_count)
        ]

    pass_plans: list[list[EdgeKernelPlan]] = []
    pass_gids: list[list[np.ndarray]] = []
    auto = passes < 0
    max_passes = 4 if auto else max(passes, 1)
    slot_cost = 0.0
    prev_total = None
    for p in range(max_passes):
        if slab_width:
            plans = shard_plans(slab_width)
        else:
            import os

            candidates = {w: shard_plans(w) for w in (256, 384, 512, 768, 1024, 1536)}
            if os.environ.get("ANEMOI_PLAN_SELECT", "cost") == "coverage":
                mean_cov = {w: float(np.mean([q.coverage for q in ps])) for w, ps in candidates.items()}
                best = max(mean_cov.values())
                width = next(w for w in candidates if mean_cov[w] >= best - 0.01)
            else:  # summed modeled cost across shards (see plan_cost)
                width = min(candidates, key=lambda w: sum(plan_cost(q) for q in candidates[w]))
            plans = candidates[width]
        if auto:
            pass_slot = sum(float(q.padded_dst * q.cap) * q.slab_width for q in plans)
            out_count = sum(len(q.outlier_src) for q in plans)
            total = slot_cost + pass_slot + PLAN_KAPPA * out_count
            if prev_total is not None and total >= prev_total:
                break  # this pass does not pay for itself; keep the chain so far
            prev_total = total
            slot_cost += pass_slot
        pass_plans.append(plans)
        pass_gids.append(list(res_gids))
        if p == max_passes - 1 or all(len(q.outlier_src) == 0 for q in plans):
            break
        res_ei = [np.stack([q.outlier_src, q.outlier_dst]).astype(np.int64) for q in plans]
        res_gids = [g[q.outlier_edge_ids] for g, q in zip(res_gids, plans)]

    k_passes = len(pass_plans)
    nblk = pass_plans[0][0].num_blocks
    rows = pass_plans[0][0].padded_dst * cap
    final_plans, final_gids = pass_plans[-1], pass_gids[-1]
    eo = max(max(len(q.outlier_src) for q in final_plans), 1)
    widths = tuple(ps[0].slab_width for ps in pass_plans)

    def stack_pass(attr):  # (S, K, ...) from per-pass per-shard plans
        return np.stack(
            [np.stack([getattr(ps[s], attr) for ps in pass_plans]) for s in range(s_count)]
        )

    slab_start = stack_pass("slab_start")  # (S, K, nblk)
    src_slab_idx = stack_pass("src_slab_idx")  # (S, K, R, 1)
    slot_mask = stack_pass("slot_mask")  # (S, K, R, 1)
    edge_ids = np.full((s_count, k_passes, rows), num_edges, dtype=np.int32)
    slot_pos_of_edge = np.full(num_edges, -1, dtype=np.int32)
    for k, (plans, gids_list) in enumerate(zip(pass_plans, pass_gids)):
        for s, q in enumerate(plans):
            live_slots = np.nonzero(q.slot_mask[:, 0] > 0)[0]
            g = gids_list[s][q.edge_ids[live_slots]]
            edge_ids[s, k][live_slots] = g
            # flat (S, K, R) position — for K == 1 this is the legacy s*R + slot
            slot_pos_of_edge[g] = (
                s * (k_passes * rows) + k * rows + live_slots
            ).astype(np.int32)
    if k_passes == 1:  # legacy single-window shapes
        slab_start = slab_start[:, 0]
        src_slab_idx = src_slab_idx[:, 0]
        slot_mask = slot_mask[:, 0]
        edge_ids = edge_ids[:, 0]

    sp = ShardedKernelPlan(
        num_shards=s_count,
        nodes_per_shard=nps,
        block_nodes=block_nodes,
        cap=cap,
        slab_width=widths[0],
        num_blocks=nblk,
        ext_rows=ext_rows,
        num_edges=num_edges,
        cont_to_ext=cont_to_ext,
        ext_to_cont=ext_to_cont,
        slab_start=slab_start,
        src_slab_idx=src_slab_idx,
        slot_mask=slot_mask,
        edge_ids=edge_ids,
        out_src=np.zeros((s_count, eo), dtype=np.int32),
        out_dst=np.zeros((s_count, eo), dtype=np.int32),
        out_eid=np.full((s_count, eo), num_edges, dtype=np.int32),
        out_mask=np.zeros((s_count, eo), dtype=np.float32),
        slot_pos_of_edge=slot_pos_of_edge,
        out_pos_of_edge=np.full(num_edges, -1, dtype=np.int32),
        num_passes=k_passes,
        slab_widths=widths,
    )
    ts_tab, ts_mask, td_tab, td_mask = [], [], [], []
    for s, q in enumerate(final_plans):
        k = len(q.outlier_src)
        sp.out_src[s, :k] = q.outlier_src
        sp.out_dst[s, :k] = q.outlier_dst
        ogids = final_gids[s][q.outlier_edge_ids]
        sp.out_eid[s, :k] = ogids
        sp.out_mask[s, :k] = 1.0
        sp.out_pos_of_edge[ogids] = (s * eo + np.arange(k)).astype(np.int32)
        # padded transpose tables: outlier positions per contiguized source
        # row / per local destination — the k/v and q gather adjoints become
        # masked position-takes (scatter-free backward under the mesh)
        src_ids = np.where(sp.out_mask[s] > 0, sp.out_src[s], -1)
        dst_ids = np.where(sp.out_mask[s] > 0, sp.out_dst[s], -1)
        for ids, nrows, tabs, masks in (
            (src_ids, ext_rows, ts_tab, ts_mask),
            (dst_ids, nps, td_tab, td_mask),
        ):
            tab, msk = _padded_transpose(ids, nrows)
            tabs.append(tab)
            masks.append(msk)

    sp.t_out_src = _stack_padded(ts_tab, ts_mask)
    sp.t_out_dst = _stack_padded(td_tab, td_mask)
    dtab, dmask = sp.t_out_dst
    md = dtab.shape[2]
    sp.out_slot_of_pos = np.full((s_count, eo), -1, dtype=np.int32)
    for s in range(s_count):
        rr, jj = np.nonzero(dmask[s])
        sp.out_slot_of_pos[s][dtab[s][rr, jj]] = (rr * md + jj).astype(np.int32)

    sp.t_contrib, sp.t_halo = _exchange_transpose_tables(part)
    return sp


@dataclass(eq=False)
class HaloGNNTables:
    """Per-shard dense gather layouts for the halo GraphConv: every take and
    the sum-aggregation run over static-width padded tables, so the whole
    sharded GNN conv — like the GraphTransformer path — compiles without
    HLO scatters, forward and backward. Arrays lead with the shard axis."""

    dst_tab: np.ndarray  # (S, nps, Mg) int32 — edge positions per destination
    dst_mask: np.ndarray  # (S, nps, Mg) bool
    dst_inv: np.ndarray  # (S, E_pad) int32 — flat (nps·Mg) slot per position
    src_tab: np.ndarray  # (S, ext, Ms) int32 — edge positions per ext source
    src_mask: np.ndarray  # (S, ext, Ms) bool
    # inverses of the halo-exchange gathers and the edge-threading gather
    t_contrib: tuple = None  # ((S, nps, 1), mask)
    t_halo: tuple = None  # ((S, S*B_pad, 1), mask)
    edge_pos: np.ndarray = None  # (E,) int32 flat (S·E_pad) slot per global edge


def build_halo_gnn_tables(part) -> HaloGNNTables:
    """Dense per-shard gather layouts from a :class:`HaloPartition`."""
    s_count, nps = part.num_shards, part.nodes_per_shard
    ext = nps + part.halo_select.shape[1]
    dt, dm, st, sm_ = [], [], [], []
    for s in range(s_count):
        live = part.edge_mask[s]
        dst_ids = np.where(live, part.local_edges[s][:, 1], -1)
        tab, msk = _padded_transpose(dst_ids, nps)
        dt.append(tab)
        dm.append(msk)
        src_ids = np.where(live, part.local_edges[s][:, 0], -1)
        tab, msk = _padded_transpose(src_ids, ext)
        st.append(tab)
        sm_.append(msk)

    dst_tab, dst_mask = _stack_padded(dt, dm)
    src_tab, src_mask = _stack_padded(st, sm_)
    mg = dst_tab.shape[2]
    e_pad = part.local_edges.shape[1]
    dst_inv = np.full((s_count, e_pad), -1, dtype=np.int32)
    for s in range(s_count):
        rr, jj = np.nonzero(dst_mask[s])
        dst_inv[s][dst_tab[s][rr, jj]] = (rr * mg + jj).astype(np.int32)

    t_contrib, t_halo = _exchange_transpose_tables(part)

    num_edges = int(part.edge_mask.sum())
    edge_pos = np.full(num_edges, -1, dtype=np.int32)
    for s in range(s_count):
        pos = np.nonzero(part.edge_mask[s])[0]
        edge_pos[part.edge_ids[s][pos]] = (s * e_pad + pos).astype(np.int32)

    return HaloGNNTables(
        dst_tab=dst_tab, dst_mask=dst_mask, dst_inv=dst_inv,
        src_tab=src_tab, src_mask=src_mask,
        t_contrib=t_contrib,
        t_halo=t_halo,
        edge_pos=edge_pos,
    )


@dataclass(eq=False)
class HaloBucketedTables:
    """Degree-bucketed per-shard gather layouts for the halo GraphConv —
    the skewed-graph twin of :class:`HaloGNNTables`.

    The flat layouts pad every destination (source) to the worst per-shard
    multiplicity; on skewed graphs (a hub node of degree 200 over a mean of
    6) that padding dwarfs the live rows and the flat path loses to segment
    ops. Here each shard's rows are split into power-of-two degree buckets
    with caps and per-bucket row counts shared across shards (padded to the
    max), so the stacked arrays stay rectangular and every shard runs the
    same SPMD program. Forward aggregation and every gather adjoint are
    per-bucket takes + static-width masked reductions — still zero HLO
    scatters in either direction.

    Arrays lead with the shard axis; ``*_buckets`` entries are
    ``(pos_tab (S, nb, cap) int32, mask (S, nb, cap) bool)`` where pos_tab
    holds edge positions in the shard-local (E_pad) edge list."""

    dst_buckets: tuple  # positions per destination row, bucketed by in-degree
    dst_reassemble: np.ndarray  # (S, nps) int32 — row slot in the bucket concat
    src_buckets: tuple  # positions per extended (local+halo) source row
    src_reassemble: np.ndarray  # (S, ext) int32
    pos_dst: np.ndarray  # (S, E_pad) int32 — destination row per position, −1 dead
    pos_src: np.ndarray  # (S, E_pad) int32 — ext source row per position, −1 dead
    # shared with HaloGNNTables: halo-exchange inverses + edge-threading slots
    t_contrib: tuple = None
    t_halo: tuple = None
    edge_pos: np.ndarray = None


def _stack_bucketed(per_shard: list) -> tuple[tuple, np.ndarray]:
    """Align per-shard ``transpose_position_tables`` outputs by bucket cap
    and stack over the shard axis. Bucket row counts pad to the per-cap max
    across shards; ``reassemble`` is recomputed against the padded concat
    layout (identical bucket offsets on every shard)."""
    s_count = len(per_shard)
    rows = len(per_shard[0][1])
    # bucket tuples are (row_ids, pair_ids, positions, mask); cap = mask width
    by_cap = [{b[3].shape[1]: b for b in bl} for bl, _ in per_shard]
    caps = sorted(set().union(*(d.keys() for d in by_cap)))
    stacked = []
    reassemble = np.zeros((s_count, rows), np.int32)
    offset = 0
    for cap in caps:
        nb = max((len(d[cap][0]) if cap in d else 0) for d in by_cap)
        pos_tab = np.zeros((s_count, nb, cap), np.int32)
        mask = np.zeros((s_count, nb, cap), bool)
        for s, d in enumerate(by_cap):
            if cap not in d:
                continue
            row_ids, _, pos, m = d[cap]
            k = len(row_ids)
            pos_tab[s, :k] = pos
            mask[s, :k] = m
            reassemble[s, row_ids] = offset + np.arange(k, dtype=np.int32)
        stacked.append((pos_tab, mask))
        offset += nb
    return tuple(stacked), reassemble


def build_halo_bucketed_tables(part) -> HaloBucketedTables:
    """Degree-bucketed per-shard gather layouts from a
    :class:`~anemoi_models_tpu.graphs.partition.HaloPartition`."""
    from anemoi_models_tpu.graphs.partition import transpose_position_tables

    s_count, nps = part.num_shards, part.nodes_per_shard
    ext = nps + part.halo_select.shape[1]
    e_pad = part.local_edges.shape[1]
    dst_ps, src_ps = [], []
    pos_dst = np.full((s_count, e_pad), -1, np.int32)
    pos_src = np.full((s_count, e_pad), -1, np.int32)
    for s in range(s_count):
        live = part.edge_mask[s]
        pos_dst[s] = np.where(live, part.local_edges[s][:, 1], -1)
        pos_src[s] = np.where(live, part.local_edges[s][:, 0], -1)
        dst_ps.append(transpose_position_tables(pos_dst[s], nps))
        src_ps.append(transpose_position_tables(pos_src[s], ext))
    dst_buckets, dst_re = _stack_bucketed(dst_ps)
    src_buckets, src_re = _stack_bucketed(src_ps)
    t_contrib, t_halo = _exchange_transpose_tables(part)

    num_edges = int(part.edge_mask.sum())
    edge_pos = np.full(num_edges, -1, dtype=np.int32)
    for s in range(s_count):
        pos = np.nonzero(part.edge_mask[s])[0]
        edge_pos[part.edge_ids[s][pos]] = (s * e_pad + pos).astype(np.int32)

    return HaloBucketedTables(
        dst_buckets=dst_buckets, dst_reassemble=dst_re,
        src_buckets=src_buckets, src_reassemble=src_re,
        pos_dst=pos_dst, pos_src=pos_src,
        t_contrib=t_contrib, t_halo=t_halo, edge_pos=edge_pos,
    )


def _padded_transpose(ids: np.ndarray, rows: int) -> tuple[np.ndarray, np.ndarray]:
    """(P,) gather ids (−1 dead) -> ((rows, M) positions, (rows, M) mask):
    for each source row, the gather positions that read it, padded to the
    max multiplicity M. The adjoint of ``x -> x[ids]`` is then a masked
    position-take + sum over M — no scatter."""
    ids = np.asarray(ids).ravel()
    pos = np.nonzero(ids >= 0)[0]
    r = ids[pos]
    order = np.argsort(r, kind="stable")
    r, pos = r[order], pos[order]
    counts = np.bincount(r, minlength=rows)
    m = max(int(counts.max()) if len(r) else 0, 1)
    offsets = np.zeros(rows + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    tab = np.full((rows, m), -1, dtype=np.int64)
    tab[r, np.arange(len(r)) - offsets[r]] = pos
    return tab, tab >= 0


def edge_set_kernel_plan(
    edge_set,
    num_dst: int,
    num_src: int,
    *,
    block_nodes: int = 128,
    cap: int = 8,
    slab_width: int = 0,
    passes: int = 0,
):
    """Cached :func:`build_edge_kernel_plan` for an EdgeSet (memo lives on
    the instance, like the neighbor-table caches).

    ``slab_width=0`` auto-selects by modeled cost (:func:`plan_cost`,
    fitted to the measured O96 slab sweep — picks 384 at refinement 5,
    matching the sweep's best). ``ANEMOI_PLAN_SELECT=coverage`` restores
    the coverage-driven rule; ``ANEMOI_PLAN_SLAB_WIDTH`` pins a width.

    ``passes=0`` reads ``ANEMOI_PLAN_PASSES`` (default 1). ``passes>1``
    builds a :class:`MultiPassPlan` (multi-window layout — restores
    coverage on high-refinement meshes where a single RCM slab cannot
    follow the bandwidth; attention flavors only); ``passes=-1`` lets the
    cost model add passes greedily while each pays for itself
    (:func:`build_multi_pass_plan` auto mode).
    """
    import os

    from anemoi_models_tpu.graphs.partition import _edge_set_cache

    if not passes:
        passes = int(os.environ.get("ANEMOI_PLAN_PASSES", "1"))
    cache = _edge_set_cache(edge_set)
    # auto-selection (width 0) depends on the selection mode: keep plans
    # chosen under different ANEMOI_PLAN_SELECT values apart in the memo
    mode = os.environ.get("ANEMOI_PLAN_SELECT", "cost") if not slab_width else ""
    key = ("kernel_plan", num_dst, num_src, block_nodes, cap, slab_width, mode, passes)
    if key not in cache:
        if passes > 1 or passes < 0:
            plan = build_multi_pass_plan(
                edge_set.edge_index, num_dst, num_src,
                block_nodes=block_nodes, cap=cap, slab_width=slab_width,
                passes=passes,
            )
        elif slab_width:
            plan = build_edge_kernel_plan(
                edge_set.edge_index, num_dst, num_src,
                block_nodes=block_nodes, cap=cap, slab_width=slab_width,
            )
        else:
            plan = _select_plan({
                w: build_edge_kernel_plan(
                    edge_set.edge_index, num_dst, num_src,
                    block_nodes=block_nodes, cap=cap, slab_width=w,
                )
                for w in (256, 384, 512, 768, 1024, 1536)
            })
        cache[key] = plan
    return cache[key]
