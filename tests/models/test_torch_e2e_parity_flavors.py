"""End-to-end torch float64 oracles for the GNN and Transformer flavors and
for the bounding stack — extending ``test_torch_e2e_parity.py`` (which pins
the GraphTransformer flavor) to every processor family.

Reference equations: GNN mappers/processor
(``/root/reference/src/anemoi/models/layers/mapper.py:421-705``,
``layers/conv.py:27-76``, ``layers/block.py:108-286``), sliding-window
transformer processor (``layers/processor.py:85-162``,
``layers/attention.py:34-112``), boundings (``layers/bounding.py:21-125``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from helpers_models import VARS, make_config
from test_torch_e2e_parity import dense, gt_block, layer_norm, t

from anemoi_models_tpu.data_indices import IndexCollection
from anemoi_models_tpu.graphs import build_enc_proc_dec_graph
from anemoi_models_tpu.models import AnemoiModelEncProcDec

T64 = torch.float64


def silu(x):
    return torch.nn.functional.silu(x)


def gelu(x):
    return torch.nn.functional.gelu(x)


def mlp_t(p, x, act=silu, with_layer_norm=True, n_extra=0):
    """Torch twin of layers/mlp.py:MLP (n_extra_layers + 2 hidden Denses)."""
    for i in range(n_extra + 2):
        x = act(dense(p[f"Dense_{i}"], x))
    x = dense(p[f"Dense_{n_extra + 2}"], x)
    if with_layer_norm:
        x = layer_norm(p["AutocastLayerNorm_0"], x)
    return x


def scatter_sum(values, dst, num_dst):
    out = torch.zeros((num_dst,) + values.shape[1:], dtype=T64)
    idx = dst[:, None].expand(-1, values.shape[1])
    return out.scatter_add_(0, idx, values)


def graph_conv_t(p, x_src, x_dst, e, edge_index, num_dst):
    """layers/conv.py:GraphConv — msg = MLP(cat[x_i, x_j, e]) + e, sum-agg."""
    src = torch.as_tensor(np.asarray(edge_index[0]), dtype=torch.long)
    dst = torch.as_tensor(np.asarray(edge_index[1]), dtype=torch.long)
    msg = mlp_t(p["MLP_0"], torch.cat([x_dst[dst], x_src[src], e], dim=-1)) + e
    return scatter_sum(msg, dst, num_dst), msg


def gnn_proc_block(p, x, e, edge_index, num_dst):
    agg, e_new = graph_conv_t(p["conv"], x, x, e, edge_index, num_dst)
    x = mlp_t(p["node_mlp"], torch.cat([x, agg], dim=-1)) + x
    return x, e_new


def gnn_mapper_block(p, x_src, x_dst, e, edge_index, update_src):
    agg, _ = graph_conv_t(p["conv"], x_src, x_dst, e, edge_index, x_dst.shape[0])
    node_mlp = p["node_mlp"]
    x_dst = mlp_t(node_mlp, torch.cat([x_dst, agg], dim=-1)) + x_dst
    if update_src:
        x_src = mlp_t(node_mlp, torch.cat([x_src, x_src], dim=-1)) + x_src
    return x_src, x_dst


def edge_inputs(sub_p, es):
    static = es.attr_tensor(["edge_length", "edge_dirs"])
    return torch.cat([t(static), t(sub_p["trainable"]["trainable"])], dim=-1), es.edge_index


def mhsa_t(p, x, num_heads, window):
    """layers/attention.py:MultiHeadSelfAttention with band-masked softmax."""
    n, c = x.shape
    d = c // num_heads
    qkv = x @ t(p["lin_qkv"]["kernel"])  # bias=False
    q, k, v = qkv.chunk(3, dim=-1)
    q, k, v = (z.view(n, num_heads, d).permute(1, 0, 2) for z in (q, k, v))  # (H, N, D)
    logits = q @ k.transpose(-1, -2) / d**0.5  # (H, N, N)
    idx = torch.arange(n)
    band = (idx[:, None] - idx[None, :]).abs() <= window
    logits = torch.where(band, logits, torch.tensor(-1e30, dtype=T64))
    out = torch.softmax(logits, dim=-1) @ v  # (H, N, D)
    out = out.permute(1, 0, 2).reshape(n, c)
    return dense(p["projection"], out)


def transformer_block(p, x, num_heads, window):
    x = x + mhsa_t(p["attention"], layer_norm(p["layer_norm1"], x), num_heads, window)
    h = gelu(dense(p["Dense_0"], layer_norm(p["layer_norm2"], x)))
    return x + dense(p["Dense_1"], h)


def oracle_forward(params, cfg, di, graph, x_np, flavor):
    p = params["params"]
    b, ts, ens, n_grid, n_in = x_np.shape
    assert b == 1 and ens == 1

    x_flat = t(x_np).permute(0, 2, 3, 1, 4).reshape(n_grid, ts * n_in)
    na = p["node_attributes"]
    sincos = lambda c: np.concatenate([np.sin(c), np.cos(c)], axis=-1)  # noqa: E731
    x_data_latent = torch.cat(
        [x_flat, t(sincos(graph["data"].coords)), t(na["trainable_data"])], dim=-1
    )
    x_hidden_latent = torch.cat(
        [t(sincos(graph["hidden"].coords)), t(na["trainable_hidden"])], dim=-1
    )

    enc, proc, dec = p["encoder"], p["processor"], p["decoder"]
    es_enc = graph[("data", "to", "hidden")]
    es_dec = graph[("hidden", "to", "data")]

    if flavor == "gnn":
        e_raw, e_idx = edge_inputs(enc, es_enc)
        e_attr = mlp_t(enc["emb_edges"], e_raw)
        x_src = mlp_t(enc["emb_nodes_src"], x_data_latent)
        x_dst = mlp_t(enc["emb_nodes_dst"], x_hidden_latent)
        x_data_hidden, x_latent = gnn_mapper_block(
            enc["proc"], x_src, x_dst, e_attr, e_idx, update_src=True
        )
    else:
        e_attr, e_idx = edge_inputs(enc, es_enc)
        # narrow-gather layout keeps emb_nodes_src inside the block scope
        emb_src = enc.get("emb_nodes_src") or enc["proc"]["emb_nodes_src"]
        x_src = dense(emb_src, x_data_latent)
        x_dst = dense(enc["emb_nodes_dst"], x_hidden_latent)
        x_latent = gt_block(enc["proc"], x_src, x_dst, e_attr, e_idx, 4, fused_qkvs=False)
        x_data_hidden = x_data_latent

    x_h = x_latent
    if flavor == "transformer":
        window = cfg.model.processor.window_size
        for cn in sorted(k for k in proc if k.startswith("proc_")):
            for bn in sorted(k for k in proc[cn] if k.startswith("blocks_")):
                x_h = transformer_block(proc[cn][bn], x_h, 4, window)
    elif flavor == "gnn":
        es_proc = graph[("hidden", "to", "hidden")]
        pe_raw, pe_idx = edge_inputs(proc, es_proc)
        e_h = None
        for cn in sorted(k for k in proc if k.startswith("proc_")):
            if "emb_edges" in proc[cn]:  # first chunk embeds edges
                e_h = mlp_t(proc[cn]["emb_edges"], pe_raw)
            for bn in sorted(k for k in proc[cn] if k.startswith("blocks_")):
                x_h, e_h = gnn_proc_block(
                    proc[cn][bn], x_h, e_h, pe_idx, x_h.shape[0]
                )
    else:
        es_proc = graph[("hidden", "to", "hidden")]
        pe_attr, pe_idx = edge_inputs(proc, es_proc)
        for cn in sorted(k for k in proc if k.startswith("proc_")):
            for bn in sorted(k for k in proc[cn] if k.startswith("blocks_")):
                x_h = gt_block(proc[cn][bn], x_h, x_h, pe_attr, pe_idx, 4, fused_qkvs=True)
    x_latent_proc = x_h + x_latent

    if flavor == "gnn":
        de_raw, de_idx = edge_inputs(dec, es_dec)
        de_attr = mlp_t(dec["emb_edges"], de_raw)
        _, x_out = gnn_mapper_block(
            dec["proc"], x_latent_proc, x_data_hidden, de_attr, de_idx, update_src=False
        )
        x_out = mlp_t(dec["node_data_extractor"], x_out, with_layer_norm=False)
    else:
        de_attr, de_idx = edge_inputs(dec, es_dec)
        x_dst2 = dense(dec["emb_nodes_dst"], x_data_hidden)
        x_out = gt_block(dec["proc"], x_latent_proc, x_dst2, de_attr, de_idx, 4, fused_qkvs=False)
        x_out = layer_norm(dec["node_data_extractor_norm"], x_out)
        x_out = dense(dec["node_data_extractor"], x_out)

    prog_in = np.asarray(di.internal_model.input.prognostic)
    prog_out = np.asarray(di.internal_model.output.prognostic)
    x_out[:, prog_out] += t(x_np)[0, -1, 0][:, prog_in]
    return x_out


BOUNDINGS = (
    {"_target_": "anemoi.models.layers.bounding.ReluBounding", "variables": ["z_500"]},
    {
        "_target_": "anemoi.models.layers.bounding.HardtanhBounding",
        "variables": ["t2m"], "min_val": -1.0, "max_val": 1.0,
    },
    {
        "_target_": "anemoi.models.layers.bounding.FractionBounding",
        "variables": ["tp"], "min_val": 0.0, "max_val": 1.0, "total_var": "t2m",
    },
)


def apply_boundings_t(x_out, di):
    """Torch twin of the config-ordered bounding stack (order matters: the
    fraction bounding reads t2m after its hardtanh clamp)."""
    n2i = di.internal_model.output.name_to_index
    z, t2m, tp = n2i["z_500"], n2i["t2m"], n2i["tp"]
    x_out[:, z] = torch.clamp(x_out[:, z], min=0.0)
    x_out[:, t2m] = torch.clamp(x_out[:, t2m], -1.0, 1.0)
    x_out[:, tp] = torch.clamp(x_out[:, tp], 0.0, 1.0) * x_out[:, t2m]
    return x_out


def _build(flavor, bounding=()):
    graph = build_enc_proc_dec_graph(grid_lat=6, mesh_refinements=2)
    cfg = make_config(flavor, bounding=bounding)
    di = IndexCollection(cfg, dict(VARS))
    model = AnemoiModelEncProcDec(model_config=cfg, data_indices=di, graph_data=graph)
    n_grid = graph["data"].num_nodes
    n_in = len(di.internal_model.input)
    x = np.random.RandomState(0).randn(1, 2, 1, n_grid, n_in).astype(np.float32)
    params = model.init(jax.random.key(0), jnp.asarray(x))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * np.random.RandomState(1).randn(*a.shape).astype(np.float32)
        if a.ndim >= 1 else a,
        params,
    )
    return graph, cfg, di, model, x, params


@pytest.mark.parametrize("flavor", ["gnn", "transformer"])
def test_flavor_forward_matches_torch_oracle(flavor):
    graph, cfg, di, model, x, params = _build(flavor)
    ours = np.asarray(model.apply(params, jnp.asarray(x)))[0, 0]
    oracle = oracle_forward(params, cfg, di, graph, x, flavor).numpy()
    scale = np.abs(oracle).mean()
    err = np.abs(ours - oracle).max()
    mean_err = np.abs(ours - oracle).mean()
    assert err < 2e-3 * max(scale, 1.0), f"{flavor} deviates from fp64 oracle: {err} (scale {scale})"
    assert mean_err < 3e-4 * max(scale, 1.0), f"{flavor} mean deviation too large: {mean_err}"


def test_gnn_rollout_rmse_drift_vs_oracle():
    """Autoregressive rollout drift of the fp32 GNN model vs its fp64 oracle
    (the flavor-parity analogue of the GraphTransformer rollout harness)."""
    graph, cfg, di, model, x, params = _build("gnn")
    n_steps = 3
    prog_in = np.asarray(di.internal_model.input.prognostic)
    prog_out = np.asarray(di.internal_model.output.prognostic)
    force_in = np.asarray(di.internal_model.input.forcing)

    from anemoi_models_tpu.training import make_rollout_fn

    rollout = jax.jit(make_rollout_fn(model, di, n_steps))
    forc = np.zeros((n_steps, 1, 1, x.shape[3], len(force_in)), np.float32)
    _, preds = rollout(params, jnp.asarray(x), jnp.asarray(forc))
    preds = np.asarray(preds)

    xo = x.copy()
    rmses = []
    for s in range(n_steps):
        yo = oracle_forward(params, cfg, di, graph, xo, "gnn").numpy()
        denom = np.sqrt(np.mean(yo**2)) + 1e-12
        rmses.append(np.sqrt(np.mean((preds[s, 0, 0] - yo) ** 2)) / denom)
        nxt = np.zeros((1, 1, 1, x.shape[3], x.shape[4]), np.float32)
        nxt[0, 0, 0][:, prog_in] = yo[:, prog_out]
        xo = np.concatenate([xo[:, 1:], nxt.reshape(1, 1, 1, x.shape[3], x.shape[4])], axis=1)
    assert rmses[0] < 1e-4, rmses
    assert rmses[-1] < 5e-3, rmses


def test_boundings_match_torch_oracle():
    graph, cfg, di, model, x, params = _build("graphtransformer", bounding=BOUNDINGS)
    ours = np.asarray(model.apply(params, jnp.asarray(x)))[0, 0]
    raw = oracle_forward(params, cfg, di, graph, x, "graphtransformer")
    oracle = apply_boundings_t(raw, di).numpy()
    scale = np.abs(oracle).mean()
    err = np.abs(ours - oracle).max()
    assert err < 2e-3 * max(scale, 1.0), f"bounded output deviates: {err} (scale {scale})"
    # the boundings actually bit: z_500 nonnegative, t2m clamped, tp fraction
    n2i = di.internal_model.output.name_to_index
    assert (ours[:, n2i["z_500"]] >= 0).all()
    assert (np.abs(ours[:, n2i["t2m"]]) <= 1.0 + 1e-6).all()
