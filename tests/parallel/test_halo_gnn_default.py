"""GNNProcessor under a model-axis mesh: halo execution with its own params.

The standard GNN processor (not the separately-parameterized
``HaloGNNProcessor``) now routes to the 1-hop halo conv under a >1 model
axis, running its own edge MLPs shard-locally as pure functions — identical
param tree to the single-device path, O(boundary) exchange instead of the
reference's full-node all-gather (``layers/block.py:203``).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.layers.processor import GNNProcessor
from anemoi_models_tpu.parallel import make_mesh, use_mesh

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")


def _build(refinements=3, ch=16, layers=2):
    g = build_enc_proc_dec_graph(grid_lat=8, mesh_refinements=refinements)
    n = g["hidden"].num_nodes
    proc = GNNProcessor(
        num_layers=layers, num_chunks=1, num_channels=ch, trainable_size=2,
        sub_graph=g[("hidden", "to", "hidden")],
    )
    x = jnp.asarray(np.random.RandomState(0).randn(1, n, ch), jnp.float32)
    return proc, x, n, ch


def test_gnn_processor_halo_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as P

    proc, x, n, ch = _build()
    params = jax.jit(proc.init)(jax.random.key(0), x)
    ref = jax.jit(proc.apply)(params, x)

    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        ps = jax.device_put(params, NamedSharding(mesh, P()))
        out = jax.jit(proc.apply)(ps, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=1e-3)


def test_gnn_processor_halo_hlo_no_full_allgather():
    from jax.sharding import NamedSharding, PartitionSpec as P

    proc, x, n, ch = _build(refinements=4)
    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        params = jax.jit(proc.init)(jax.random.key(0), xs)
        compiled = jax.jit(proc.apply).lower(params, xs).compile()
        out = compiled(params, xs)
    assert jnp.isfinite(out).all()

    # every all-gather must move at most the boundary pool — never a full
    # node tensor and never the full edge set
    full_node_elems = n * ch
    biggest = 0
    for line in compiled.as_text().splitlines():
        if " all-gather(" not in line and " all-gather-start(" not in line:
            continue
        m = re.search(r"=\s+(?:\()?[a-z0-9]+\[([0-9,]*)\]", line)
        if not m:
            continue
        dims = [int(d) for d in m.group(1).split(",") if d]
        elems = int(np.prod(dims)) if dims else 1
        biggest = max(biggest, elems)
    assert biggest < full_node_elems, (
        f"full-node all-gather leaked into the halo GNN processor: {biggest} >= {full_node_elems}"
    )


def test_gnn_processor_halo_backward_is_scatter_free():
    """With the HaloGNNTables gather layouts, the sharded GNN processor's
    gradient compiles without HLO scatters (only the reduce-scatter
    collective adjoint of the halo all-gather)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    proc, x, n, ch = _build(refinements=2)
    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        params = jax.jit(proc.init)(jax.random.key(0), xs)

        def loss(p, x):
            return jnp.sum(proc.apply(p, x) ** 2)

        compiled = jax.jit(jax.grad(loss, argnums=(0, 1))).lower(params, xs).compile()
        gp, gx = compiled(params, xs)
    assert jnp.isfinite(gx).all()
    bad = [
        ln for ln in compiled.as_text().splitlines()
        if "scatter(" in ln and "reduce-scatter" not in ln and "reduce_scatter" not in ln
    ]
    assert not bad, f"halo GNN backward must be scatter-free: {bad[:3]}"


def test_gnn_processor_halo_grads_flow():
    from jax.sharding import NamedSharding, PartitionSpec as P

    proc, x, n, ch = _build(refinements=2)
    mesh = make_mesh(data=1, model=8)
    with use_mesh(mesh):
        xs = jax.device_put(x, NamedSharding(mesh, P()))
        params = jax.jit(proc.init)(jax.random.key(0), xs)

        def loss(p, x):
            return jnp.sum(proc.apply(p, x) ** 2)

        gp, gx = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, xs)
    for kp, leaf in jax.tree_util.tree_leaves_with_path(gp):
        assert jnp.isfinite(leaf).all(), kp
    assert jnp.isfinite(gx).all() and float(jnp.abs(gx).max()) > 0
