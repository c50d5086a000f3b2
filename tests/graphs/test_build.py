import numpy as np

from anemoi_models_tpu.graphs import (
    build_enc_proc_dec_graph,
    icosahedral_nodes,
    knn_edges,
    latlon_grid_nodes,
)
from anemoi_models_tpu.graphs.build import multiscale_edges


def test_latlon_grid():
    ns = latlon_grid_nodes(8)
    assert ns.num_nodes == 8 * 16
    assert ns.coords.shape == (128, 2)
    assert np.all(np.abs(ns.coords[:, 0]) < np.pi / 2)


def test_icosahedral_counts():
    ns0, _ = icosahedral_nodes(0)
    assert ns0.num_nodes == 12
    ns2, faces = icosahedral_nodes(2)
    # V = 10*4^r + 2
    assert ns2.num_nodes == 10 * 16 + 2
    assert len(faces) == 3
    # unit sphere
    xyz = np.stack(
        [
            np.cos(ns2.coords[:, 0]) * np.cos(ns2.coords[:, 1]),
            np.cos(ns2.coords[:, 0]) * np.sin(ns2.coords[:, 1]),
            np.sin(ns2.coords[:, 0]),
        ],
        axis=-1,
    )
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=-1), 1.0, atol=1e-12)


def test_multiscale_edges_superset():
    _, faces = icosahedral_nodes(2)
    fine = multiscale_edges(faces[-1:])
    multi = multiscale_edges(faces)
    assert multi.shape[1] > fine.shape[1]


def test_knn_edges():
    src = latlon_grid_nodes(6)
    dst, _ = icosahedral_nodes(1)
    idx = knn_edges(src, dst, k=3)
    assert idx.shape == (2, dst.num_nodes * 3)
    assert idx[1].max() == dst.num_nodes - 1
    assert idx[0].max() < src.num_nodes


def test_full_graph_csr_sorted():
    g = build_enc_proc_dec_graph(grid_lat=8, mesh_refinements=1)
    for (src, _, dst), es in g.edge_items():
        d = es.edge_index[1]
        assert np.all(np.diff(d) >= 0), "edges must be CSR-sorted by destination"
        assert es.dst_ptr is not None
        assert es.dst_ptr[-1] == es.num_edges
        assert "edge_length" in es.attrs and "edge_dirs" in es.attrs
        assert es.attrs["edge_length"].shape == (es.num_edges, 1)
        assert es.attrs["edge_dirs"].shape == (es.num_edges, 2)
        # every hidden (dst of encoder) node must receive at least one edge
        if dst == "hidden":
            assert np.all(np.diff(es.dst_ptr) > 0)


def test_hetero_graph_npz_roundtrip(tmp_path):
    """Graphs round-trip to .npz bit-exactly (build once, load everywhere)."""
    import numpy as np

    from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
    from anemoi_models_tpu.graphs.container import HeteroGraph

    g = build_enc_proc_dec_graph(grid_lat=8, mesh_refinements=1)
    path = g.save(str(tmp_path / "graph.npz"))
    g2 = HeteroGraph.load(path)

    assert set(g2.nodes) == set(g.nodes)
    assert set(g2.edges) == set(g.edges)
    for name, ns in g.nodes.items():
        np.testing.assert_array_equal(g2[name].coords, ns.coords)
        assert set(g2[name].attrs) == set(ns.attrs)
        for a in ns.attrs:
            np.testing.assert_array_equal(g2[name].attrs[a], ns.attrs[a])
    for key, es in g.edges.items():
        np.testing.assert_array_equal(g2[key].edge_index, es.edge_index)
        np.testing.assert_array_equal(g2[key].dst_ptr, es.dst_ptr)
        for a in es.attrs:
            np.testing.assert_array_equal(g2[key].attrs[a], es.attrs[a])
