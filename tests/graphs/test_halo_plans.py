"""Invariants of the per-shard halo kernel plans (build_halo_kernel_plans).

Every edge lands in exactly one slot-or-outlier position; contiguized
coordinates round-trip to the correct global node; the padded transpose
tables invert their gathers exactly.
"""

import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.graphs.kernel_plan import _padded_transpose, build_halo_kernel_plans
from anemoi_models_tpu.graphs.partition import partition_1hop


@pytest.fixture(scope="module")
def setup():
    g = build_enc_proc_dec_graph(grid_lat=8, mesh_refinements=3)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes
    ei = np.asarray(es.edge_index)
    part = partition_1hop(ei, n, 8)
    sp = build_halo_kernel_plans(part, slab_width=256)
    return ei, n, part, sp


def _halo_globals(part, s):
    b_pad = part.boundary_contrib.shape[1]
    sel = part.halo_select[s]
    owner = sel // b_pad
    return owner * part.nodes_per_shard + part.boundary_contrib[owner, sel % b_pad]


def test_every_edge_covered_exactly_once(setup):
    ei, n, part, sp = setup
    covered = np.concatenate([
        sp.edge_ids[sp.slot_mask[..., 0] > 0].ravel(),
        sp.out_eid[sp.out_mask > 0].ravel(),
    ])
    assert len(covered) == ei.shape[1]
    assert len(np.unique(covered)) == ei.shape[1]


def test_slot_and_outlier_coordinates_roundtrip(setup):
    ei, n, part, sp = setup
    nps, nb, cap = part.nodes_per_shard, sp.block_nodes, sp.cap
    for s in range(sp.num_shards):
        halo_g = _halo_globals(part, s)

        def to_global(cont_rows):
            ext = sp.cont_to_ext[s][cont_rows]
            return np.where(
                ext < nps, s * nps + ext,
                halo_g[np.clip(ext - nps, 0, len(halo_g) - 1)],
            )

        live = np.nonzero(sp.slot_mask[s, :, 0] > 0)[0]
        block_of = live // (nb * cap)
        cont = sp.slab_start[s][block_of] + sp.src_slab_idx[s][live, 0]
        np.testing.assert_array_equal(to_global(cont), ei[0][sp.edge_ids[s][live]])
        np.testing.assert_array_equal(live // cap + s * nps, ei[1][sp.edge_ids[s][live]])

        out_live = sp.out_mask[s] > 0
        np.testing.assert_array_equal(
            to_global(sp.out_src[s][out_live]), ei[0][sp.out_eid[s][out_live]]
        )
        np.testing.assert_array_equal(
            sp.out_dst[s][out_live] + s * nps, ei[1][sp.out_eid[s][out_live]]
        )


def test_contiguized_permutation_is_bijective(setup):
    _, _, part, sp = setup
    for s in range(sp.num_shards):
        np.testing.assert_array_equal(
            sp.ext_to_cont[s][sp.cont_to_ext[s]], np.arange(sp.ext_rows)
        )


def test_padded_transpose_inverts_gather():
    rng = np.random.RandomState(0)
    rows, positions = 37, 120
    ids = rng.randint(-1, rows, size=positions)
    tab, mask = _padded_transpose(ids, rows)
    x = rng.randn(rows, 3)
    gathered = np.where((ids >= 0)[:, None], x[np.clip(ids, 0, rows - 1)], 0.0)
    # adjoint of gather = transpose-sum: sum of cotangents per source row
    g = rng.randn(positions, 3)
    want = np.zeros((rows, 3))
    for p, i in enumerate(ids):
        if i >= 0:
            want[i] += g[p]
    got = np.where(mask[..., None], g[np.clip(tab, 0, positions - 1)], 0.0).sum(axis=1)
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert gathered.shape == (positions, 3)


def test_out_slot_of_pos_inverts_dst_table(setup):
    _, _, part, sp = setup
    dtab, dmask = sp.t_out_dst
    md = dtab.shape[2]
    for s in range(sp.num_shards):
        rr, jj = np.nonzero(dmask[s])
        pos = dtab[s][rr, jj]
        np.testing.assert_array_equal(sp.out_slot_of_pos[s][pos], rr * md + jj)
        dead = sp.out_mask[s] <= 0
        assert np.all(sp.out_slot_of_pos[s][dead] == -1)


def test_cost_model_slab_selection(monkeypatch):
    """Auto-select picks by modeled cost (384 at r5-class graphs, the
    measured sweep's best); ANEMOI_PLAN_SELECT=coverage restores the old
    rule (which picks a wider slab with marginally better coverage)."""
    from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
    from anemoi_models_tpu.graphs.kernel_plan import edge_set_kernel_plan, plan_cost

    g = build_enc_proc_dec_graph(grid_lat=24, mesh_refinements=4)
    es = g[("hidden", "to", "hidden")]
    n = g["hidden"].num_nodes

    plan_cost_sel = edge_set_kernel_plan(es, n, n)
    monkeypatch.setenv("ANEMOI_PLAN_SELECT", "coverage")
    # the memo keys auto-selected plans by selection mode, so this rebuilds
    plan_cov = edge_set_kernel_plan(es, n, n)
    assert plan_cov.coverage >= plan_cost_sel.coverage - 0.01
    # the cost model never picks a strictly costlier plan
    widths = (256, 384, 512, 768, 1024, 1536)
    from anemoi_models_tpu.graphs.kernel_plan import build_edge_kernel_plan

    costs = {
        w: plan_cost(build_edge_kernel_plan(es.edge_index, n, n, slab_width=w))
        for w in widths
    }
    assert plan_cost(plan_cost_sel) == min(costs.values())
