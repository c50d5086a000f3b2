"""Minimal self-contained zarr v2 directory-store reader/writer.

The reference ecosystem's data contract is an anemoi-datasets zarr store —
a root group holding a ``data`` array of shape (time, variables, ensemble,
cell) plus per-variable statistics arrays (``mean`` / ``stdev`` /
``minimum`` / ``maximum``), coordinate arrays (``latitudes`` /
``longitudes``) and a ``name_to_index`` attribute — which the reference's
interface consumes as plain dicts
(``/root/reference/src/anemoi/models/interface/__init__.py:52-66``).

No ``zarr``/``numcodecs`` dependency is available in this image, and the
zarr v2 on-disk format is simple (JSON metadata + per-chunk compressed
blobs), so the store is read/written directly:

- compressors: ``null``, ``zlib``, ``gzip``, ``bz2``, ``lzma`` (stdlib) and
  ``zstd`` (the ``zstandard`` wheel). Blosc-compressed stores (the
  anemoi-datasets default in some configs) are detected and rejected with a
  pointer to re-encode — the blosc container format needs the native
  library.
- both ``.`` and ``/`` chunk-key separators are handled; missing chunks
  read as ``fill_value``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

__all__ = ["ZarrArray", "ZarrGroup", "write_zarr_array", "write_zarr_group_attrs"]


def _decompress(blob: bytes, compressor: Optional[dict]) -> bytes:
    if compressor is None:
        return blob
    cid = compressor.get("id")
    if cid == "zlib":
        import zlib

        return zlib.decompress(blob)
    if cid == "gzip":
        import gzip

        return gzip.decompress(blob)
    if cid == "bz2":
        import bz2

        return bz2.decompress(blob)
    if cid == "lzma":
        import lzma

        return lzma.decompress(blob)
    if cid == "zstd":
        import zstandard

        return zstandard.ZstdDecompressor().decompress(blob)
    if cid == "blosc":
        raise NotImplementedError(
            "this store is blosc-compressed; the blosc native library is not "
            "available here — re-encode the store with zlib/zstd/null "
            "compression (e.g. `anemoi-datasets copy --rechunk`)"
        )
    raise NotImplementedError(f"unsupported zarr compressor {cid!r}")


def _compress(raw: bytes, compressor: Optional[dict]) -> bytes:
    if compressor is None:
        return raw
    cid = compressor.get("id")
    level = int(compressor.get("level", 1))
    if cid == "zlib":
        import zlib

        return zlib.compress(raw, level)
    if cid == "zstd":
        import zstandard

        return zstandard.ZstdCompressor(level=level).compress(raw)
    raise NotImplementedError(f"unsupported write compressor {cid!r}")


class ZarrArray:
    """One zarr v2 array in a directory store; supports slicing along the
    leading axis (``arr[t0:t1]``) and full reads (``arr[:]``)."""

    def __init__(self, path: str) -> None:
        self.path = path
        with open(os.path.join(path, ".zarray")) as f:
            meta = json.load(f)
        if meta.get("zarr_format") != 2:
            raise ValueError(f"{path}: not a zarr v2 array")
        if meta.get("filters"):
            raise NotImplementedError(f"{path}: zarr filters are not supported")
        if meta.get("order", "C") != "C":
            raise NotImplementedError(f"{path}: only C-order arrays are supported")
        self.shape = tuple(meta["shape"])
        self.chunks = tuple(meta["chunks"])
        self.dtype = np.dtype(meta["dtype"])
        self.compressor = meta.get("compressor")
        self.fill_value = meta.get("fill_value", 0)
        self.separator = meta.get("dimension_separator", ".")

    def __len__(self) -> int:
        return self.shape[0]

    def _chunk(self, idx: tuple[int, ...]) -> np.ndarray:
        key = self.separator.join(str(i) for i in idx)
        fp = os.path.join(self.path, key)
        if not os.path.exists(fp):
            out = np.empty(self.chunks, self.dtype)
            out[...] = self.fill_value if self.fill_value is not None else 0
            return out
        with open(fp, "rb") as f:
            raw = _decompress(f.read(), self.compressor)
        return np.frombuffer(raw, self.dtype).reshape(self.chunks)

    def __getitem__(self, index) -> np.ndarray:
        if index is Ellipsis or (isinstance(index, slice) and index == slice(None)):
            t0, t1 = 0, self.shape[0]
        elif isinstance(index, slice):
            t0, t1, step = index.indices(self.shape[0])
            assert step == 1, "only unit-step slices are supported"
        elif isinstance(index, (int, np.integer)):
            return self[int(index) : int(index) + 1][0]
        else:
            raise TypeError(f"unsupported index {index!r}")

        out = np.empty((t1 - t0,) + self.shape[1:], self.dtype)
        grid = [range(-(-s // c)) for s, c in zip(self.shape[1:], self.chunks[1:])]
        c0 = self.chunks[0]
        import itertools

        for tc in range(t0 // c0, -(-t1 // c0)):
            for rest in itertools.product(*grid):
                chunk = self._chunk((tc,) + rest)
                # chunk extent in the global array
                tg0, tg1 = tc * c0, min((tc + 1) * c0, self.shape[0])
                sel_t = slice(max(tg0, t0), min(tg1, t1))
                if sel_t.start >= sel_t.stop:
                    continue
                dst = [slice(sel_t.start - t0, sel_t.stop - t0)]
                src = [slice(sel_t.start - tg0, sel_t.stop - tg0)]
                for d, ci in enumerate(rest):
                    c = self.chunks[1 + d]
                    g0, g1 = ci * c, min((ci + 1) * c, self.shape[1 + d])
                    dst.append(slice(g0, g1))
                    src.append(slice(0, g1 - g0))
                out[tuple(dst)] = chunk[tuple(src)]
        return out


class ZarrGroup:
    """A zarr v2 directory-store group: attributes + named member arrays."""

    def __init__(self, path: str) -> None:
        self.path = path
        if not os.path.exists(os.path.join(path, ".zgroup")):
            raise ValueError(f"{path}: no .zgroup — not a zarr group")
        attrs_path = os.path.join(path, ".zattrs")
        self.attrs: dict = {}
        if os.path.exists(attrs_path):
            with open(attrs_path) as f:
                self.attrs = json.load(f)

    def arrays(self) -> list[str]:
        return sorted(
            name
            for name in os.listdir(self.path)
            if os.path.exists(os.path.join(self.path, name, ".zarray"))
        )

    def __contains__(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path, name, ".zarray"))

    def __getitem__(self, name: str) -> ZarrArray:
        return ZarrArray(os.path.join(self.path, name))


def write_zarr_array(
    group_path: str,
    name: str,
    data: np.ndarray,
    chunks: Optional[Sequence[int]] = None,
    compressor: Optional[dict] = None,
) -> None:
    """Write one array into a zarr v2 directory store (creates the group)."""
    os.makedirs(group_path, exist_ok=True)
    zgroup = os.path.join(group_path, ".zgroup")
    if not os.path.exists(zgroup):
        with open(zgroup, "w") as f:
            json.dump({"zarr_format": 2}, f)

    data = np.ascontiguousarray(data)
    if chunks is None:
        chunks = (1,) + data.shape[1:] if data.ndim > 1 else (len(data) or 1,)
    chunks = tuple(int(min(c, s)) if s else 1 for c, s in zip(chunks, data.shape))
    apath = os.path.join(group_path, name)
    os.makedirs(apath, exist_ok=True)
    meta = {
        "zarr_format": 2,
        "shape": list(data.shape),
        "chunks": list(chunks),
        "dtype": data.dtype.str,
        "compressor": compressor,
        "fill_value": 0,
        "order": "C",
        "filters": None,
    }
    with open(os.path.join(apath, ".zarray"), "w") as f:
        json.dump(meta, f)

    import itertools

    grid = [range(-(-s // c)) for s, c in zip(data.shape, chunks)]
    for idx in itertools.product(*grid):
        sel = tuple(
            slice(i * c, min((i + 1) * c, s)) for i, c, s in zip(idx, chunks, data.shape)
        )
        block = data[sel]
        if block.shape != chunks:  # zarr chunks are always full-size on disk
            full = np.zeros(chunks, data.dtype)
            full[tuple(slice(0, e) for e in block.shape)] = block
            block = full
        with open(os.path.join(apath, ".".join(str(i) for i in idx)), "wb") as f:
            f.write(_compress(np.ascontiguousarray(block).tobytes(), compressor))


def write_zarr_group_attrs(group_path: str, attrs: dict) -> None:
    os.makedirs(group_path, exist_ok=True)
    zgroup = os.path.join(group_path, ".zgroup")
    if not os.path.exists(zgroup):
        with open(zgroup, "w") as f:
            json.dump({"zarr_format": 2}, f)
    with open(os.path.join(group_path, ".zattrs"), "w") as f:
        json.dump(attrs, f, default=str)
