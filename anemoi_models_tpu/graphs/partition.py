"""Host-side graph partitioning/layout utilities.

TPU-first edge layouts: scatter/segment ops are TPU-hostile (serialized
scatter-adds), so at model build time each CSR-sorted edge set is also lowered
to a **padded dense neighbor table**: for every destination node, the ids of
its incoming edges padded to the max in-degree, plus a validity mask. Graph
aggregation then becomes gather → masked reduce over a static-width axis —
pure VPU/MXU work, no scatter. This replaces the role of the reference's
1-hop edge sorting (``distributed/khop_edges.py:50-130``) and the
torch_geometric scatter machinery at once.
"""

from __future__ import annotations

import jax
import numpy as np

from anemoi_models_tpu.graphs.container import EdgeSet

__all__ = [
    "dense_neighbor_table",
    "edge_set_neighbor_table",
    "bucketed_neighbor_tables",
    "transpose_position_tables",
    "transpose_slot_tables",
    "edge_set_bucketed_tables",
    "bucketed_transpose_bundle",
    "edge_set_gather_tables",
    "HaloPartition",
    "partition_1hop",
]


def dense_neighbor_table(
    edge_index: np.ndarray, num_dst: int, pad_to_multiple: int = 1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build (edge_ids, src_ids, mask) dense tables from CSR-sorted edges.

    - ``edge_ids``: (num_dst, max_deg) int32, positions into the edge arrays
      (0-padded).
    - ``src_ids``: (num_dst, max_deg) int32 source node ids (0-padded).
    - ``mask``: (num_dst, max_deg) bool validity.

    Requires ``edge_index`` sorted by destination (``EdgeSet.sort_by_dst``).
    """
    from anemoi_models_tpu import native

    src, dst = np.asarray(edge_index)
    assert np.all(np.diff(dst) >= 0), "edge_index must be CSR-sorted by destination"
    result = native.dense_tables(np.asarray(edge_index), num_dst, pad_to_multiple)
    if result is not None:
        return result
    counts = np.bincount(dst, minlength=num_dst)
    max_deg = int(counts.max()) if counts.size else 0
    if pad_to_multiple > 1 and max_deg % pad_to_multiple:
        max_deg += pad_to_multiple - max_deg % pad_to_multiple
    max_deg = max(max_deg, 1)

    edge_ids = np.zeros((num_dst, max_deg), dtype=np.int32)
    src_ids = np.zeros((num_dst, max_deg), dtype=np.int32)
    mask = np.zeros((num_dst, max_deg), dtype=bool)

    # position of each edge within its destination's bucket
    starts = np.zeros(num_dst + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    pos_in_bucket = np.arange(len(dst)) - starts[dst]
    edge_ids[dst, pos_in_bucket] = np.arange(len(dst), dtype=np.int32)
    src_ids[dst, pos_in_bucket] = src.astype(np.int32)
    mask[dst, pos_in_bucket] = True
    return edge_ids, src_ids, mask


def _edge_set_cache(edge_set: EdgeSet) -> dict:
    """Per-instance memo dict living on the EdgeSet (dies with it — an
    id()-keyed module cache could serve stale tables after address reuse)."""
    cache = getattr(edge_set, "_layout_cache", None)
    if cache is None:
        cache = {}
        object.__setattr__(edge_set, "_layout_cache", cache)
    return cache


def edge_set_neighbor_table(
    edge_set: EdgeSet, num_dst: int, pad_to_multiple: int = 1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cached :func:`dense_neighbor_table` for an EdgeSet."""
    cache = _edge_set_cache(edge_set)
    key = ("dense", num_dst, pad_to_multiple)
    if key not in cache:
        cache[key] = dense_neighbor_table(edge_set.edge_index, num_dst, pad_to_multiple)
    return cache[key]


# ---------------------------------------------------------------------------
# 1-hop (halo) domain decomposition
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402


@dataclass
class HaloPartition:
    """Host-side plan for 1-hop halo exchange over a contiguous node split.

    Destination nodes are split contiguously over ``num_shards`` (equal-pad
    split: every shard owns ``nodes_per_shard`` rows, the last rows of the
    global tensor may be padding). For each shard, the incoming edges are
    remapped so source positions index an extended per-shard tensor
    ``[local nodes | halo nodes]``; halo features are fetched from a global
    *boundary pool* assembled by one all-gather of each shard's boundary
    contribution — O(boundary) communication instead of the reference's full
    all-gather (``distributed/graph.py:92-113``).

    Arrays (S = num_shards):
    - ``local_edges``: (S, E_pad, 2) int32 — per-shard [src_ext, dst_local]
      edge list, padded with (0, 0).
    - ``edge_mask``: (S, E_pad) bool.
    - ``boundary_contrib``: (S, B_pad) int32 — local node positions each
      shard contributes to the boundary pool (padded with 0).
    - ``halo_select``: (S, H_pad) int32 — positions into the flattened
      (S*B_pad) boundary pool forming each shard's halo (padded with 0).
    - ``halo_mask``: (S, H_pad) bool.
    - ``nodes_per_shard``: rows owned per shard (grid padded to S*nps).
    """

    num_shards: int
    num_nodes: int
    nodes_per_shard: int
    local_edges: np.ndarray
    edge_mask: np.ndarray
    boundary_contrib: np.ndarray
    halo_select: np.ndarray
    halo_mask: np.ndarray
    edge_ids: np.ndarray = None  # (S, E_pad) global edge ids per shard slot

    @property
    def halo_width(self) -> int:
        return self.halo_select.shape[1]


def partition_1hop(edge_index: np.ndarray, num_nodes: int, num_shards: int) -> HaloPartition:
    """Build a :class:`HaloPartition` for a homogeneous edge set."""
    src, dst = np.asarray(edge_index, dtype=np.int64)
    nps = -(-num_nodes // num_shards)  # ceil: equal shards with tail padding

    shard_of = lambda n: np.minimum(n // nps, num_shards - 1)  # noqa: E731

    # per-shard edge lists + halo node sets
    per_shard_edges: list[np.ndarray] = []
    per_shard_halo: list[np.ndarray] = []
    per_shard_edge_ids: list[np.ndarray] = []
    for s in range(num_shards):
        lo, hi = s * nps, min((s + 1) * nps, num_nodes)
        sel = (dst >= lo) & (dst < hi)
        e_src, e_dst = src[sel], dst[sel]
        remote = e_src[(e_src < lo) | (e_src >= hi)]
        per_shard_halo.append(np.unique(remote))
        per_shard_edges.append(np.stack([e_src, e_dst - lo], axis=1))
        per_shard_edge_ids.append(np.nonzero(sel)[0])

    # boundary pool: nodes needed by any other shard, grouped by owner
    needed = np.unique(np.concatenate(per_shard_halo)) if per_shard_halo else np.empty(0, np.int64)
    owner = shard_of(needed)
    b_pad = max(int(np.max(np.bincount(owner, minlength=num_shards))) if needed.size else 0, 1)
    boundary_contrib = np.zeros((num_shards, b_pad), dtype=np.int32)
    # global node id -> position in flattened boundary pool
    pool_pos = {}
    for s in range(num_shards):
        mine = needed[owner == s]
        boundary_contrib[s, : len(mine)] = (mine - s * nps).astype(np.int32)
        for i, n in enumerate(mine):
            pool_pos[int(n)] = s * b_pad + i

    h_pad = max(max((len(h) for h in per_shard_halo), default=0), 1)
    halo_select = np.zeros((num_shards, h_pad), dtype=np.int32)
    halo_mask = np.zeros((num_shards, h_pad), dtype=bool)
    e_pad = max(max((len(e) for e in per_shard_edges), default=0), 1)
    local_edges = np.zeros((num_shards, e_pad, 2), dtype=np.int32)
    edge_mask = np.zeros((num_shards, e_pad), dtype=bool)
    edge_ids = np.zeros((num_shards, e_pad), dtype=np.int64)

    for s in range(num_shards):
        lo = s * nps
        halo = per_shard_halo[s]
        halo_select[s, : len(halo)] = [pool_pos[int(n)] for n in halo]
        halo_mask[s, : len(halo)] = True
        # remap edge sources: local -> position, halo -> nps + halo_rank
        halo_rank = {int(n): i for i, n in enumerate(halo)}
        e = per_shard_edges[s]
        src_ext = np.empty(len(e), dtype=np.int32)
        for i, (gsrc, _) in enumerate(e):
            if lo <= gsrc < lo + nps:
                src_ext[i] = gsrc - lo
            else:
                src_ext[i] = nps + halo_rank[int(gsrc)]
        local_edges[s, : len(e), 0] = src_ext
        local_edges[s, : len(e), 1] = e[:, 1]
        edge_mask[s, : len(e)] = True
        edge_ids[s, : len(e)] = per_shard_edge_ids[s]

    return HaloPartition(
        num_shards=num_shards,
        num_nodes=num_nodes,
        nodes_per_shard=nps,
        local_edges=local_edges,
        edge_mask=edge_mask,
        boundary_contrib=boundary_contrib,
        halo_select=halo_select,
        halo_mask=halo_mask,
        edge_ids=edge_ids,
    )


# ---------------------------------------------------------------------------
# Degree-bucketed dense tables
# ---------------------------------------------------------------------------


def bucketed_neighbor_tables(
    edge_index: np.ndarray, num_dst: int, min_cap: int = 4, assume_sorted: bool = False
) -> tuple[list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]], np.ndarray]:
    """Dense neighbor tables bucketed by in-degree.

    A single flat table pads every destination to the global max in-degree —
    ruinous when the degree distribution is skewed (lat/lon grids near the
    poles: mean ~17, max ~200+). Here destinations are partitioned into
    power-of-two degree buckets; each bucket gets its own (node_ids, edge_ids,
    src_ids, mask) table padded only to the bucket cap. Aggregation runs per
    bucket and results are reassembled by one gather via ``reassemble``
    (position of each destination in the concatenated bucket outputs).

    Requires CSR-sorted edges. Returns ``(buckets, reassemble)``.
    """
    src, dst = edge_index[0], edge_index[1]
    if not assume_sorted:  # internally-constructed inputs skip the O(E) scan
        assert np.all(np.diff(dst) >= 0), "edge_index must be CSR-sorted by destination"
    counts = np.bincount(dst, minlength=num_dst)
    starts = np.zeros(num_dst + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    caps: list[int] = []
    cap = max(min_cap, 1)
    max_deg = int(counts.max()) if counts.size else 1
    while cap < max_deg:
        caps.append(cap)
        cap *= 2
    caps.append(max(cap, 1))

    from anemoi_models_tpu import native

    src32 = np.ascontiguousarray(src, dtype=np.int32) if len(src) else None
    bucket_of = np.searchsorted(np.asarray(caps), counts, side="left")
    buckets = []
    reassemble = np.zeros(num_dst, dtype=np.int32)
    offset = 0
    for b, cap in enumerate(caps):
        node_ids = np.nonzero(bucket_of == b)[0].astype(np.int32)
        if node_ids.size == 0:
            continue
        nb = len(node_ids)
        got = native.fill_bucket_tables(src32, starts, node_ids, cap) if src32 is not None else None
        if got is not None:
            edge_ids, src_ids, mask = got
        else:
            k = counts[node_ids]  # (nb,) true degrees, all <= cap
            slots = np.arange(cap, dtype=np.int64)
            mask = slots[None, :] < k[:, None]
            eid = starts[node_ids][:, None] + slots[None, :]
            edge_ids = np.where(mask, eid, 0).astype(np.int32)
            if len(src):
                src_ids = np.where(mask, src[np.minimum(eid, len(src) - 1)], 0).astype(np.int32)
            else:
                src_ids = np.zeros_like(edge_ids)
        buckets.append((node_ids, edge_ids, src_ids, mask))
        reassemble[node_ids] = offset + np.arange(nb, dtype=np.int32)
        offset += nb
    return buckets, reassemble


def edge_set_bucketed_tables(edge_set: EdgeSet, num_dst: int):
    """Cached :func:`bucketed_neighbor_tables` for an EdgeSet."""
    cache = _edge_set_cache(edge_set)
    key = ("bucketed", num_dst)
    if key not in cache:
        cache[key] = bucketed_neighbor_tables(edge_set.edge_index, num_dst)
    return cache[key]


def transpose_position_tables(
    ids: np.ndarray, num_rows: int, min_cap: int = 4
) -> tuple[list, np.ndarray]:
    """Bucketed tables mapping each row of a gathered tensor back to the
    positions that read it.

    ``ids`` (P,) holds the source row gathered at each position (−1 = dead
    slot). The returned ``(buckets, reassemble)`` — in the exact format of
    :func:`bucketed_neighbor_tables`, with positions in the ``edge_ids``
    slot — lets the *adjoint* of ``x -> x[ids]`` run as
    ``ops.dense_graph.bucketed_neighbor_sum(cotangent, buckets, reassemble)``:
    a gather + static-width masked reduction instead of a scatter-add, which
    is the difference between MXU-speed backward and serialized scatters on
    TPU (the round-1 train step was ~13x the forward because of these).
    """
    from anemoi_models_tpu import native

    ids = np.asarray(ids).ravel()
    got = native.sort_positions_by_row(ids, num_rows)
    if got is not None:  # counting sort in C++: O(P), no argsort
        _, rows_sorted, pos_sorted = got
    else:
        pos = np.nonzero(ids >= 0)[0]
        rows = ids[pos]
        order = np.argsort(rows, kind="stable")
        rows_sorted, pos_sorted = rows[order], pos[order]
    return bucketed_neighbor_tables(
        (np.asarray(pos_sorted, np.int64), np.asarray(rows_sorted, np.int64)),
        num_rows,
        min_cap=min_cap,
        assume_sorted=True,
    )


def transpose_slot_tables(
    src_ids: np.ndarray, mask: np.ndarray, num_rows: int, min_cap: int = 4
) -> tuple[list, np.ndarray]:
    """:func:`transpose_position_tables` over a padded (n, cap) slot table
    with its validity mask — the forward bucket layout — without
    materializing the flat where(mask, ids, -1) vector."""
    from anemoi_models_tpu import native

    got = native.sort_positions_by_row_masked(src_ids, mask, num_rows)
    if got is None:
        flat = np.where(
            np.asarray(mask).ravel(), np.asarray(src_ids).ravel().astype(np.int64), -1
        )
        return transpose_position_tables(flat, num_rows, min_cap=min_cap)
    _, rows_sorted, pos_sorted = got
    return bucketed_neighbor_tables(
        (pos_sorted, rows_sorted), num_rows, min_cap=min_cap, assume_sorted=True
    )


def bucketed_transpose_bundle(
    buckets: list, num_dst: int, num_src: int, num_edges: int
) -> dict:
    """Host-side adjoint layout for the bucketed gather path.

    For each forward bucket, precompute what its three gathers' adjoints
    need so every backward is itself a gather (see
    :func:`transpose_position_tables`):

    - ``t_src``: transpose tables turning the k/v source-gather adjoint into
      a ``bucketed_neighbor_sum`` over the cotangent slots;
    - ``pos_of_edge`` (E,): flat slot of each edge in this bucket (−1 if the
      edge lives in another bucket) — the edge-gather adjoint is one take;
    - ``pos_of_node`` (num_dst,): row of each destination in this bucket
      (−1 elsewhere) — the query-gather adjoint is one take.

    Plus ``node_concat`` (num_dst,), the inverse of ``reassemble`` for the
    final reordering take.
    """
    per_bucket = []
    for node_ids, edge_ids, src_ids, mask in buckets:
        flat_mask = mask.ravel()
        t_src = transpose_slot_tables(src_ids, mask, num_src)
        pos_of_edge = np.full(num_edges, -1, dtype=np.int32)
        pos_of_edge[edge_ids.ravel()[flat_mask]] = np.nonzero(flat_mask)[0].astype(np.int32)
        pos_of_node = np.full(num_dst, -1, dtype=np.int32)
        pos_of_node[node_ids] = np.arange(len(node_ids), dtype=np.int32)
        per_bucket.append({"t_src": t_src, "pos_of_edge": pos_of_edge, "pos_of_node": pos_of_node})
    node_concat = np.concatenate([b[0] for b in buckets]) if buckets else np.zeros(0, np.int32)
    return {"per_bucket": per_bucket, "node_concat": node_concat, "num_src": num_src}


def edge_set_gather_tables(edge_set: EdgeSet, num_dst: int, num_src: int):
    """Cached (buckets, reassemble, transpose-bundle) for an EdgeSet —
    the full gather-only forward+backward layout."""
    cache = _edge_set_cache(edge_set)
    key = ("gather_tables", num_dst, num_src)
    if key not in cache:
        buckets, reassemble = edge_set_bucketed_tables(edge_set, num_dst)
        bundle = bucketed_transpose_bundle(buckets, num_dst, num_src, edge_set.num_edges)
        cache[key] = (buckets, reassemble, bundle)
    return cache[key]


# ---------------------------------------------------------------------------
# Sharded mapper slot tables (bipartite, model-axis parallelism)
# ---------------------------------------------------------------------------


@jax.tree_util.register_static
@dataclass(eq=False)  # identity eq/hash: ndarray fields, rides jit as static
class MapperShardTables:
    """Per-shard single-cap slot layout for bipartite mapper attention under
    a ``model`` mesh axis (``parallel/mapper_conv.py``).

    Destination rows are split contiguously over ``num_shards`` (tail-padded
    to ``S * dst_per_shard``). Each shard's incoming edges fill a
    (dst_per_shard, cap) slot table; source ids index the tail-padded GLOBAL
    source tensor, re-assembled on device by one tiled all-gather of the
    narrow source rows. All adjoints are precomputed position tables so
    forward AND backward are scatter-free.

    This is the mapper-side answer to the reference's model sharding
    (``distributed/graph.py:140-298``): dst-local attention + one narrow
    source collective, instead of head all-to-alls over GSPMD (which falls
    into involuntary full rematerializations on the mapper dataflow).
    """

    num_shards: int
    num_dst: int
    num_src: int
    dst_per_shard: int  # nps (dst padded to S*nps)
    src_per_shard: int  # nsps (src padded to S*nsps)
    cap: int
    src_ids: np.ndarray  # (S, nps, cap) int32 into the padded global src
    mask: np.ndarray  # (S, nps, cap) bool
    slot_edge_gids: np.ndarray  # (S*nps*cap,) int32 global edge id per flat slot
    pos_of_edge: np.ndarray  # (E,) int32 flat slot of each edge (unique)
    t_src_tab: np.ndarray  # (S, S*nsps, M) int32 per-shard flat slot positions
    t_src_mask: np.ndarray  # (S, S*nsps, M) bool

    @property
    def slots_per_shard(self) -> int:
        return self.dst_per_shard * self.cap


def mapper_shard_tables(
    edge_set: EdgeSet, num_dst: int, num_src: int, shards: int
) -> MapperShardTables:
    """Cached :class:`MapperShardTables` for a CSR-sorted bipartite edge set."""
    cache = _edge_set_cache(edge_set)
    key = ("mapper_shard", num_dst, num_src, shards)
    if key in cache:
        return cache[key]

    from anemoi_models_tpu.graphs.kernel_plan import _padded_transpose

    src, dst = np.asarray(edge_set.edge_index, dtype=np.int64)
    num_edges = len(dst)
    assert np.all(np.diff(dst) >= 0), "edge_index must be CSR-sorted by destination"
    nps = -(-num_dst // shards)
    nsps = -(-num_src // shards)
    ns_pad = nsps * shards
    counts = np.bincount(dst, minlength=num_dst)
    starts = np.zeros(num_dst + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    cap = max(int(counts.max()) if num_edges else 1, 1)

    src_ids = np.zeros((shards, nps, cap), dtype=np.int32)
    mask = np.zeros((shards, nps, cap), dtype=bool)
    slot_gid = np.zeros((shards, nps, cap), dtype=np.int32)
    pos_of_edge = np.full(num_edges, -1, dtype=np.int32)
    t_tabs, t_masks = [], []
    for s in range(shards):
        lo, hi = s * nps, min((s + 1) * nps, num_dst)
        e_lo, e_hi = int(starts[lo]), int(starts[hi])
        d_loc = (dst[e_lo:e_hi] - lo).astype(np.int64)
        slot = np.arange(e_lo, e_hi) - starts[dst[e_lo:e_hi]]
        src_ids[s, d_loc, slot] = src[e_lo:e_hi].astype(np.int32)
        mask[s, d_loc, slot] = True
        slot_gid[s, d_loc, slot] = np.arange(e_lo, e_hi, dtype=np.int32)
        pos_of_edge[e_lo:e_hi] = (s * nps * cap + d_loc * cap + slot).astype(np.int32)
        flat_ids = np.where(mask[s].ravel(), src_ids[s].ravel().astype(np.int64), -1)
        tab, msk = _padded_transpose(flat_ids, ns_pad)
        t_tabs.append(tab)
        t_masks.append(msk)

    m_width = max(t.shape[1] for t in t_tabs)
    t_src_tab = np.zeros((shards, ns_pad, m_width), dtype=np.int32)
    t_src_mask = np.zeros((shards, ns_pad, m_width), dtype=bool)
    for s, (tab, msk) in enumerate(zip(t_tabs, t_masks)):
        t_src_tab[s, :, : tab.shape[1]] = np.where(msk, tab, 0).astype(np.int32)
        t_src_mask[s, :, : msk.shape[1]] = msk

    result = MapperShardTables(
        num_shards=shards,
        num_dst=num_dst,
        num_src=num_src,
        dst_per_shard=nps,
        src_per_shard=nsps,
        cap=cap,
        src_ids=src_ids,
        mask=mask,
        slot_edge_gids=slot_gid.reshape(-1),
        pos_of_edge=pos_of_edge,
        t_src_tab=t_src_tab,
        t_src_mask=t_src_mask,
    )
    cache[key] = result
    return result
