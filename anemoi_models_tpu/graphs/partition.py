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

import numpy as np

from anemoi_models_tpu.graphs.container import EdgeSet

__all__ = ["dense_neighbor_table", "edge_set_neighbor_table"]


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


_TABLE_CACHE: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}


def edge_set_neighbor_table(
    edge_set: EdgeSet, num_dst: int, pad_to_multiple: int = 1
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Cached :func:`dense_neighbor_table` for an EdgeSet."""
    key = id(edge_set)
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = dense_neighbor_table(edge_set.edge_index, num_dst, pad_to_multiple)
    return _TABLE_CACHE[key]
