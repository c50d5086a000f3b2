from anemoi_models_tpu.graphs.build import (
    build_enc_proc_dec_graph,
    build_hierarchical_graph,
    cutoff_edges,
    edge_attributes,
    icosahedral_nodes,
    knn_edges,
    latlon_grid_nodes,
    nodes_from_coords,
    octahedral_grid_nodes,
)
from anemoi_models_tpu.graphs.container import EdgeSet, HeteroGraph, NodeSet

__all__ = [
    "EdgeSet",
    "HeteroGraph",
    "NodeSet",
    "build_enc_proc_dec_graph",
    "build_hierarchical_graph",
    "cutoff_edges",
    "edge_attributes",
    "icosahedral_nodes",
    "knn_edges",
    "latlon_grid_nodes",
    "nodes_from_coords",
    "octahedral_grid_nodes",
]
