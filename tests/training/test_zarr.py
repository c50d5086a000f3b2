"""Zarr (anemoi-datasets layout) dataset reader.

The reference ecosystem's data contract is a zarr store with a
(time, vars, ensemble, cell) ``data`` array, statistics arrays, and a
``name_to_index`` attribute (consumed by the reference interface,
``/root/reference/src/anemoi/models/interface/__init__.py:52-66``). These
tests pin the self-contained store reader/writer round-trip and the full
training path off a zarr source.
"""

import json
import os

import numpy as np
import pytest

from anemoi_models_tpu.training.dataset import ZarrDataset, open_dataset, save_zarr_dataset
from anemoi_models_tpu.training.zarr_store import (
    ZarrArray,
    write_zarr_array,
    write_zarr_group_attrs,
)


def _coords(n):
    rng = np.random.RandomState(0)
    lat = (rng.rand(n) - 0.5) * np.pi * 0.98
    lon = rng.rand(n) * 2 * np.pi - np.pi
    return np.stack([lat, lon], axis=-1)


@pytest.mark.parametrize("compressor", [None, {"id": "zlib", "level": 1}, {"id": "zstd", "level": 1}])
def test_zarr_array_roundtrip(tmp_path, compressor):
    data = np.random.RandomState(1).randn(7, 3, 1, 11).astype(np.float32)
    write_zarr_array(str(tmp_path / "g"), "data", data, chunks=(2, 3, 1, 4), compressor=compressor)
    arr = ZarrArray(str(tmp_path / "g" / "data"))
    np.testing.assert_array_equal(arr[:], data)
    np.testing.assert_array_equal(arr[2:5], data[2:5])
    np.testing.assert_array_equal(arr[6], data[6])


def test_zarr_dataset_roundtrip(tmp_path):
    t, g, v = 10, 24, 4
    names = ["lsm", "z_500", "t_850", "tp"]
    data = np.random.RandomState(2).randn(t, g, v).astype(np.float32)
    path = str(tmp_path / "toy.zarr")
    ds = save_zarr_dataset(path, data, names, _coords(g))
    assert isinstance(ds, ZarrDataset)
    assert len(ds) == t and ds.variables == names
    np.testing.assert_allclose(ds.window(3, 4), data[3:7], rtol=1e-6)
    np.testing.assert_allclose(ds.statistics["mean"], data.reshape(-1, v).mean(0), rtol=1e-5)
    # coords come back in radians
    assert np.abs(ds.coords[:, 0]).max() <= np.pi / 2 + 1e-6
    np.testing.assert_allclose(ds.coords, _coords(g), atol=1e-6)
    # open_dataset dispatches on the store marker
    ds2 = open_dataset(path)
    assert isinstance(ds2, ZarrDataset)
    np.testing.assert_array_equal(ds2.window(0, 2), ds.window(0, 2))


def test_zarr_dataset_name_to_index_order(tmp_path):
    """name_to_index with non-sorted insertion order must resolve by index."""
    path = str(tmp_path / "g.zarr")
    data = np.random.RandomState(3).randn(4, 2, 1, 6).astype(np.float32)
    write_zarr_group_attrs(path, {"name_to_index": {"b": 1, "a": 0}})
    write_zarr_array(path, "data", data)
    for k in ("mean", "stdev", "minimum", "maximum"):
        write_zarr_array(path, k, np.zeros(2, np.float32) + 1)
    write_zarr_array(path, "latitudes", np.zeros(6))
    write_zarr_array(path, "longitudes", np.zeros(6))
    ds = ZarrDataset(path)
    assert ds.variables == ["a", "b"]
    assert ds.name_to_index == {"a": 0, "b": 1}


def test_zarr_blosc_truncated_chunk_rejected(tmp_path):
    path = str(tmp_path / "b.zarr")
    os.makedirs(path + "/data")
    with open(path + "/.zgroup", "w") as f:
        json.dump({"zarr_format": 2}, f)
    meta = {"zarr_format": 2, "shape": [2, 2], "chunks": [2, 2], "dtype": "<f4",
            "compressor": {"id": "blosc", "cname": "lz4"}, "fill_value": 0,
            "order": "C", "filters": None}
    with open(path + "/data/.zarray", "w") as f:
        json.dump(meta, f)
    with open(path + "/data/0.0", "wb") as f:
        f.write(b"xxxx")  # not even a blosc header
    arr = ZarrArray(path + "/data")
    with pytest.raises(ValueError, match="blosc"):
        arr[:]


@pytest.mark.parametrize("cname", ["zstd", "zlib", "lz4", "blosclz"])
@pytest.mark.parametrize("shuffle", [0, 1, 2])
def test_zarr_blosc_roundtrip(tmp_path, cname, shuffle):
    """Blosc-compressed stores (the anemoi-datasets default) read back
    bit-exactly through the self-contained chunk parser."""
    rng = np.random.RandomState(0)
    data = rng.randn(5, 3, 1, 4).astype(np.float32)
    comp = {"id": "blosc", "cname": cname, "clevel": 3, "shuffle": shuffle,
            "blocksize": 64}  # tiny blocks: multi-block + tail coverage
    write_zarr_array(str(tmp_path / "g"), "data", data, chunks=(2, 3, 1, 4),
                     compressor=comp)
    arr = ZarrArray(str(tmp_path / "g" / "data"))
    np.testing.assert_array_equal(arr[:], data)
    np.testing.assert_array_equal(arr[1:4], data[1:4])


def test_train_run_and_evaluate_from_zarr(tmp_path):
    """The full training driver runs off a zarr source: graph from the
    store's own coordinates, normalizer from its statistics, eval tail."""
    from anemoi_models_tpu.training.run import train_run

    t, g, v = 40, 64, 4
    names = ["lsm", "z_500", "t_850", "tp"]
    rng = np.random.RandomState(4)
    base = rng.randn(1, g, v).astype(np.float32)
    drift = 0.01 * rng.randn(t, 1, v).astype(np.float32)
    data = base + np.cumsum(drift, axis=0)
    path = str(tmp_path / "train.zarr")
    save_zarr_dataset(path, data, names, _coords(g))

    source = open_dataset(path)
    out = train_run(
        source,
        forcing=("lsm",),
        diagnostic=("tp",),
        flavor="graphtransformer",
        mesh_refinements=1,
        model_kwargs={"num_channels": 16, "num_layers": 2, "num_chunks": 1,
                      "num_heads": 4, "trainable_hidden": 4, "trainable_edges": 2,
                      "compute_dtype": "float32"},
        steps=3,
        batch_size=2,
        eval_every=3,
        eval_rollout=2,
        log=lambda *_: None,
    )
    assert out["steps_done"] == 3
    assert np.isfinite(out["losses"]).all()
    assert out["eval"] and np.isfinite(out["eval"][0]["rmse_mean"])
