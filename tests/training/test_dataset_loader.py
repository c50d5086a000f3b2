"""Dataset readers and the input pipeline (training/dataset.py, loader.py)."""

import numpy as np
import pytest

from anemoi_models_tpu.training import (
    BatchLoader,
    H5Dataset,
    MemmapDataset,
    SyntheticSource,
    WindowSampler,
    device_prefetch,
    open_dataset,
    save_memmap_dataset,
)


def _coords(n=12):
    rng = np.random.RandomState(3)
    lat = (rng.rand(n) - 0.5) * np.pi
    lon = rng.rand(n) * 2 * np.pi
    return np.stack([lat, lon], axis=-1).astype(np.float32)


def _data(t=10, g=12, v=3):
    return np.arange(t * g * v, dtype=np.float32).reshape(t, g, v) / 100.0


class TestMemmapDataset:
    def test_round_trip(self, tmp_path):
        data, coords = _data(), _coords()
        ds = save_memmap_dataset(str(tmp_path / "ds"), data, ["a", "b", "c"], coords)
        assert len(ds) == 10
        assert ds.variables == ["a", "b", "c"]
        assert ds.name_to_index == {"a": 0, "b": 1, "c": 2}
        np.testing.assert_allclose(ds.coords, coords, rtol=1e-6)
        np.testing.assert_array_equal(ds.window(2, 4), data[2:6])
        np.testing.assert_allclose(ds.statistics["mean"], data.reshape(-1, 3).mean(0), rtol=1e-5)

    def test_open_dataset_dir(self, tmp_path):
        save_memmap_dataset(str(tmp_path / "ds"), _data(), ["a", "b", "c"], _coords())
        ds = open_dataset(str(tmp_path / "ds"))
        assert isinstance(ds, MemmapDataset)

    def test_window_bounds(self, tmp_path):
        ds = save_memmap_dataset(str(tmp_path / "ds"), _data(), ["a", "b", "c"], _coords())
        with pytest.raises(IndexError):
            ds.window(8, 4)
        with pytest.raises(IndexError):
            ds.window(-1, 2)

    def test_explicit_statistics_preserved(self, tmp_path):
        stats = {
            "mean": np.zeros(3),
            "stdev": np.ones(3),
            "minimum": -np.ones(3),
            "maximum": np.ones(3),
        }
        ds = save_memmap_dataset(
            str(tmp_path / "ds"), _data(), ["a", "b", "c"], _coords(), statistics=stats
        )
        np.testing.assert_array_equal(ds.statistics["stdev"], np.ones(3, np.float32))

    def test_bad_meta_rejected(self, tmp_path):
        import json
        import os

        d = tmp_path / "bad"
        os.makedirs(d)
        np.save(d / "data.npy", _data())
        with open(d / "meta.json", "w") as f:
            json.dump({"variables": ["a", "b", "c"]}, f)
        with pytest.raises(ValueError, match="metadata lacks"):
            MemmapDataset(str(d))


class TestH5Dataset:
    def test_round_trip(self, tmp_path):
        data, coords = _data(), _coords()
        path = str(tmp_path / "ds.h5")
        ds = H5Dataset.write(path, data, ["a", "b", "c"], coords)
        assert len(ds) == 10
        assert ds.variables == ["a", "b", "c"]
        np.testing.assert_array_equal(ds.window(0, 3), data[:3])
        np.testing.assert_allclose(ds.statistics["mean"], data.reshape(-1, 3).mean(0), rtol=1e-5)
        ds.close()

    def test_open_dataset_h5(self, tmp_path):
        path = str(tmp_path / "ds.h5")
        H5Dataset.write(path, _data(), ["a", "b", "c"], _coords()).close()
        ds = open_dataset(path)
        assert isinstance(ds, H5Dataset)
        ds.close()


def test_open_dataset_rejects_unknown(tmp_path):
    with pytest.raises(ValueError, match="unrecognized"):
        open_dataset(str(tmp_path / "nope.zarr"))


class TestSyntheticSource:
    def test_contract(self):
        src = SyntheticSource(_coords(), num_vars=4, num_steps=20, seed=1)
        assert len(src) == 20
        w = src.window(3, 5)
        assert w.shape == (5, 12, 4)
        # deterministic: same window twice is identical
        np.testing.assert_array_equal(w, src.window(3, 5))
        # consecutive windows overlap consistently
        np.testing.assert_array_equal(src.window(4, 2)[0], w[1])
        with pytest.raises(IndexError):
            src.window(18, 5)


class TestWindowSampler:
    def test_epoch_coverage(self):
        s = WindowSampler(num_steps=20, window=3, batch_size=4, seed=0)
        assert s.num_valid == 18
        assert s.batches_per_epoch == 4
        it = iter(s)
        starts = np.concatenate([next(it) for _ in range(4)])
        assert len(np.unique(starts)) == 16  # no repeats inside an epoch
        assert starts.min() >= 0 and starts.max() <= 17

    def test_deterministic_per_seed(self):
        a = np.concatenate([b for _, b in zip(range(3), WindowSampler(20, 3, 4, seed=7))])
        b = np.concatenate([b for _, b in zip(range(3), WindowSampler(20, 3, 4, seed=7))])
        c = np.concatenate([b for _, b in zip(range(3), WindowSampler(20, 3, 4, seed=8))])
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)

    def test_no_shuffle_is_sequential(self):
        s = WindowSampler(10, 2, 3, shuffle=False)
        it = iter(s)
        np.testing.assert_array_equal(next(it), [0, 1, 2])
        np.testing.assert_array_equal(next(it), [3, 4, 5])

    def test_resume(self):
        s1 = WindowSampler(30, 2, 4, seed=5)
        it1 = iter(s1)
        for _ in range(6):  # into epoch 1
            next(it1)
        state = s1.state()
        expected = [next(it1) for _ in range(3)]

        s2 = WindowSampler(30, 2, 4, seed=5)
        s2.restore(state)
        it2 = iter(s2)
        got = [next(it2) for _ in range(3)]
        for e, g in zip(expected, got):
            np.testing.assert_array_equal(e, g)

    def test_too_few_steps(self):
        with pytest.raises(ValueError, match="windows"):
            WindowSampler(num_steps=4, window=3, batch_size=4)


class TestBatchLoader:
    def test_content_matches_source(self, tmp_path):
        data = _data(t=16)
        ds = save_memmap_dataset(str(tmp_path / "ds"), data, ["a", "b", "c"], _coords())
        sampler = WindowSampler(len(ds), window=3, batch_size=2, shuffle=False)
        loader = BatchLoader(ds, sampler, max_batches=3)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0].shape == (2, 3, 12, 3)
        np.testing.assert_array_equal(batches[0][0], data[0:3])
        np.testing.assert_array_equal(batches[0][1], data[1:4])
        np.testing.assert_array_equal(batches[1][0], data[2:5])
        loader.close()

    def test_worker_error_propagates(self):
        class Bad:
            def window(self, start, length):
                raise RuntimeError("disk on fire")

        sampler = WindowSampler(10, 2, 2, shuffle=False)
        loader = BatchLoader(Bad(), sampler, max_batches=1)
        with pytest.raises(RuntimeError, match="disk on fire"):
            list(loader)
        loader.close()

    def test_close_mid_stream(self, tmp_path):
        ds = save_memmap_dataset(str(tmp_path / "ds"), _data(t=64), ["a", "b", "c"], _coords())
        loader = BatchLoader(ds, WindowSampler(64, 2, 2), depth=2)
        it = iter(loader)
        next(it)
        loader.close()  # must not hang even with a full queue


def test_device_prefetch_preserves_order(tmp_path):
    import jax

    data = _data(t=12)
    ds = save_memmap_dataset(str(tmp_path / "ds"), data, ["a", "b", "c"], _coords())
    sampler = WindowSampler(len(ds), window=2, batch_size=2, shuffle=False)
    loader = BatchLoader(ds, sampler, max_batches=4)
    out = list(device_prefetch(loader, prefetch=2))
    assert len(out) == 4
    assert all(isinstance(x, jax.Array) for x in out)
    np.testing.assert_array_equal(np.asarray(out[0][0]), data[0:2])
    np.testing.assert_array_equal(np.asarray(out[3][0]), data[6:8])
    loader.close()


def test_device_prefetch_with_sharding(tmp_path):
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")
    data = _data(t=12)
    ds = save_memmap_dataset(str(tmp_path / "ds"), data, ["a", "b", "c"], _coords())
    loader = BatchLoader(ds, WindowSampler(12, 2, 2, shuffle=False), max_batches=2)
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    out = list(device_prefetch(loader, prefetch=1, sharding=sharding))
    assert len(out) == 2
    assert out[0].sharding.is_equivalent_to(sharding, out[0].ndim)
    np.testing.assert_array_equal(np.asarray(out[0][0]), data[0:2])
    loader.close()


def test_check_source_layout_rejects_reordered_variables(tmp_path):
    import numpy as np

    from anemoi_models_tpu.graphs import latlon_grid_nodes
    from anemoi_models_tpu.training import train_run
    from anemoi_models_tpu.training.dataset import (
        SyntheticSource,
        check_source_layout,
        save_memmap_dataset,
    )

    coords = latlon_grid_nodes(8).coords
    source = SyntheticSource(coords, num_vars=4, num_steps=24, seed=0)
    result = train_run(
        source, forcing=("var_0",), steps=1, mesh_refinements=1,
        model_kwargs=dict(num_channels=16, num_layers=1, num_heads=2, num_chunks=1,
                          trainable_hidden=2, trainable_edges=2),
        batch_size=2, seed=0, log=lambda s: None,
    )
    iface = result["interface"]
    check_source_layout(iface, source)  # matching layout passes

    data = source.window(0, 24)
    shuffled = save_memmap_dataset(
        str(tmp_path / "shuffled"), data[..., [1, 0, 2, 3]],
        ["var_1", "var_0", "var_2", "var_3"], coords,
    )
    with pytest.raises(ValueError, match="layout does not match"):
        check_source_layout(iface, shuffled)


def test_batch_loader_workers_deterministic(tmp_path):
    """Parallel window stacking yields the exact batches of the serial path."""
    import numpy as np

    from anemoi_models_tpu.graphs import latlon_grid_nodes
    from anemoi_models_tpu.training.dataset import SyntheticSource, save_memmap_dataset
    from anemoi_models_tpu.training.loader import BatchLoader, WindowSampler

    coords = latlon_grid_nodes(6).coords
    src = SyntheticSource(coords, num_vars=3, num_steps=30, seed=4)
    ds = save_memmap_dataset(str(tmp_path / "d"), src.window(0, 30), src.variables, coords)

    def collect(workers):
        sampler = WindowSampler(len(ds), 3, 4, seed=7)
        loader = BatchLoader(ds, sampler, max_batches=5, workers=workers)
        try:
            return list(loader)
        finally:
            loader.close()

    serial, parallel = collect(1), collect(4)
    assert len(serial) == len(parallel) == 5
    for a, b in zip(serial, parallel):
        np.testing.assert_array_equal(a, b)
