"""Blosc chunk format + LZ4 block codec: the self-contained decoders that
make anemoi-datasets' default-compressed zarr stores directly readable
(``training/zarr_store.py``, ``native.lz4_decompress``)."""

import numpy as np
import pytest

from anemoi_models_tpu import native
from anemoi_models_tpu.native import _blosclz_decompress_py, _lz4_decompress_py
from anemoi_models_tpu.training.zarr_store import (
    _bitshuffle,
    _bitunshuffle,
    _blosc_compress,
    _blosc_decompress,
    _blosclz_compress_naive,
    _lz4_compress_naive,
    _shuffle,
    _unshuffle,
)

DECODERS = [("py", lambda b, n: _lz4_decompress_py(b, n))]
if native.available():
    DECODERS.append(("native", lambda b, n: native.lz4_decompress(b, n)))

BLZ_DECODERS = [("py", lambda b, n: _blosclz_decompress_py(b, n))]
if native.available():
    BLZ_DECODERS.append(("native", lambda b, n: native.blosclz_decompress(b, n)))


@pytest.mark.parametrize("name,decode", DECODERS)
def test_lz4_hand_vectors(name, decode):
    # final sequence, literals only
    assert decode(b"\x40abcd", 4) == b"abcd"
    # one literal + offset-1 match of length 7 (overlapping copy semantics)
    assert decode(b"\x13a\x01\x00\x00", 8) == b"a" * 8
    # literal-length extension: 15 + 3 = 18 literals
    assert decode(b"\xf0\x03" + b"x" * 18, 18) == b"x" * 18
    # match-length extension: token mlen nibble 15 -> 15+4 + ext 2 = 21
    out = decode(b"\x1fa\x01\x00\x02\x00", 22)
    assert out == b"a" * 22
    # offset-2 alternating pattern
    assert decode(b"\x24ab\x02\x00\x00", 10) == b"ababababab"


@pytest.mark.parametrize("name,decode", DECODERS)
def test_lz4_malformed_rejected(name, decode):
    with pytest.raises(ValueError):
        decode(b"\x13a\x00\x00\x00", 8)  # offset 0
    with pytest.raises(ValueError):
        decode(b"\x13a\x05\x00\x00", 8)  # offset beyond output
    with pytest.raises(ValueError):
        decode(b"\xf0", 20)  # truncated literal-length extension
    with pytest.raises(ValueError):
        decode(b"\x40ab", 4)  # truncated literals


@pytest.mark.parametrize("name,decode", DECODERS)
def test_lz4_naive_compressor_roundtrip(name, decode):
    rng = np.random.RandomState(0)
    cases = [
        b"",
        b"short",
        bytes(rng.randint(0, 256, 100, dtype=np.uint8)),  # incompressible
        b"\x00" * 500,  # pure run
        b"header" + b"\x07" * 300 + b"tail-bytes" + b"\x07" * 64,
        np.zeros(137, np.float32).tobytes(),
    ]
    compressed_any = False
    for raw in cases:
        comp = _lz4_compress_naive(raw)
        assert decode(comp, len(raw)) == raw
        compressed_any |= len(comp) < max(len(raw), 1)
    assert compressed_any  # the run cases must actually produce matches


def test_shuffle_inverse():
    rng = np.random.RandomState(1)
    for typesize in (1, 2, 4, 8):
        for n in (0, 4, 64, 257):  # incl. a non-multiple tail
            raw = bytes(rng.randint(0, 256, n, dtype=np.uint8))
            assert _unshuffle(_shuffle(raw, typesize), typesize) == raw


@pytest.mark.parametrize("cname", ["zstd", "zlib", "lz4", "blosclz"])
@pytest.mark.parametrize("shuffle", [0, 1, 2])
def test_blosc_container_roundtrip(cname, shuffle):
    rng = np.random.RandomState(2)
    for raw in (
        b"",
        np.arange(500, dtype=np.float32).tobytes(),  # compressible
        bytes(rng.randint(0, 256, 1000, dtype=np.uint8)),  # raw-block path
        np.full(123, 2.5, np.float64).tobytes(),  # tail not block-aligned
    ):
        for typesize in (1, 4, 8):
            chunk = _blosc_compress(raw, typesize, cname=cname, shuffle=shuffle,
                                    blocksize=256)
            assert _blosc_decompress(chunk) == raw


def test_blosc_memcpy_mode():
    import struct

    raw = b"0123456789abcdef" * 4
    header = struct.pack("<BBBB", 2, 1, 0x2, 1)  # memcpy flag
    header += struct.pack("<iii", len(raw), len(raw), 16 + len(raw))
    assert _blosc_decompress(header + raw) == raw


@pytest.mark.parametrize("name,decode", BLZ_DECODERS)
def test_blosclz_hand_vectors(name, decode):
    # pure literal run: ctrl = n-1, then n bytes
    assert decode(bytes([3]) + b"abcd", 4) == b"abcd"
    # literal 'a' + short match (ctrl>>5 = 5 -> copy 7) at distance 1 (RLE)
    assert decode(bytes([0]) + b"a" + bytes([5 << 5, 0]), 8) == b"a" * 8
    # extended match length: nibble 7, ext 0 -> copy 9
    assert decode(bytes([0]) + b"a" + bytes([7 << 5, 0, 0]), 10) == b"a" * 10
    # extended match length with a 255 continuation: copy 9 + 255 + 1 = 265
    assert decode(bytes([0]) + b"x" + bytes([7 << 5, 255, 1, 0]), 266) == b"x" * 266
    # distance-2 alternating copy
    assert decode(bytes([1]) + b"ab" + bytes([3 << 5, 1]), 7) == b"abababa"
    # far match: 16-bit offset biased by MAX_DISTANCE (8191). Build >8193
    # bytes of literals, then copy 4 bytes from distance 8193.
    body = bytes(range(256)) * 33  # 8448 bytes
    stream = bytearray()
    for j in range(0, len(body), 32):
        stream.append(31)
        stream += body[j : j + 32]
    stream += bytes([(2 << 5) | 31, 255, 0, 1])  # len 4, ofs16=1 -> d=8193
    expect = body + body[len(body) - 8193 : len(body) - 8193 + 4]
    assert decode(bytes(stream), len(expect)) == expect


@pytest.mark.parametrize("name,decode", BLZ_DECODERS)
def test_blosclz_malformed_rejected(name, decode):
    with pytest.raises(ValueError):
        decode(bytes([0]) + b"a" + bytes([5 << 5, 7]), 8)  # distance beyond output
    with pytest.raises(ValueError):
        decode(bytes([7]) + b"ab", 8)  # truncated literals
    with pytest.raises(ValueError):
        decode(bytes([0]) + b"a" + bytes([7 << 5, 255]), 300)  # truncated ext
    with pytest.raises(ValueError):
        decode(bytes([3]) + b"abcd", 7)  # wrong decoded length


@pytest.mark.parametrize("name,decode", BLZ_DECODERS)
def test_blosclz_naive_compressor_roundtrip(name, decode):
    rng = np.random.RandomState(3)
    cases = [
        b"",
        b"short",
        bytes(rng.randint(0, 256, 100, dtype=np.uint8)),
        b"\x00" * 500,
        b"header" + b"\x07" * 300 + b"tail-bytes" + b"\x07" * 64,
        np.zeros(137, np.float32).tobytes(),
    ]
    compressed_any = False
    for raw in cases:
        comp = _blosclz_compress_naive(raw)
        assert decode(comp, len(raw)) == raw
        compressed_any |= len(comp) < max(len(raw), 1)
    assert compressed_any


def test_bitshuffle_hand_vectors():
    # 8 uint8 elements, element 0 = 0b11: bit-position rows 0 and 1 each
    # hold exactly element 0's bit -> output bytes [1, 1, 0, ...]
    raw = bytes([3, 0, 0, 0, 0, 0, 0, 0])
    assert _bitshuffle(raw, 1) == bytes([1, 1, 0, 0, 0, 0, 0, 0])
    # 8 uint16 elements all == 1: bit-position 0 row = 8 set bits -> 0xff
    raw = np.full(8, 1, np.uint16).tobytes()
    out = _bitshuffle(raw, 2)
    assert out[0] == 0xFF and all(b == 0 for b in out[1:])
    # non-multiple-of-8 tail copied raw (c-blosc prefix rule)
    raw = bytes(range(20))
    out = _bitshuffle(raw, 2)  # 10 elements -> 8 shuffled, 2 copied
    assert out[16:] == raw[16:]


def test_bitshuffle_inverse():
    rng = np.random.RandomState(4)
    for typesize in (1, 2, 4, 8):
        for n in (0, 64, 256, 250, 130):  # incl. non-multiple-of-8 elems
            raw = bytes(rng.randint(0, 256, n * typesize, dtype=np.uint8))
            assert _bitunshuffle(_bitshuffle(raw, typesize), typesize) == raw


def test_blosc_split_mode_decode():
    """Real c-blosc chunks (lz4/blosclz defaults) split each block into
    `typesize` independently-compressed streams unless the DONT_SPLIT
    header bit is set. Hand-construct such a chunk — full blocks split,
    leftover tail block single-stream — and decode it."""
    import struct

    typesize, blocksize = 4, 512
    raw = np.arange(300, dtype=np.float32).tobytes()  # 1200 B: 512+512+176
    nbytes = len(raw)
    nblocks = -(-nbytes // blocksize)
    flags = (1 << 5) | 0x1  # lz4 format, byte-shuffle, split allowed
    header = struct.pack("<BBBB", 2, 1, flags, typesize)

    blocks = []
    for j in range(nblocks):
        block = raw[j * blocksize : (j + 1) * blocksize]
        bsize = len(block)
        block = _shuffle(block, typesize)
        nstreams = typesize if bsize == blocksize and bsize // typesize >= 128 else 1
        neblock = bsize // nstreams
        body = b""
        for s in range(nstreams):
            stream = block[s * neblock : (s + 1) * neblock]
            comp = _lz4_compress_naive(stream)
            if len(comp) >= neblock:  # store raw
                body += struct.pack("<i", neblock) + stream
            else:
                body += struct.pack("<i", len(comp)) + comp
        blocks.append(body)

    table_off = 16 + 4 * nblocks
    starts, payload, pos = [], b"", table_off
    for body in blocks:
        starts.append(pos)
        payload += body
        pos += len(body)
    chunk = (
        header
        + struct.pack("<iii", nbytes, blocksize, pos)
        + struct.pack(f"<{nblocks}i", *starts)
        + payload
    )
    assert _blosc_decompress(chunk) == raw


def test_snappy_hand_vectors():
    from anemoi_models_tpu.training.zarr_store import _snappy_decompress

    # pure literal: uvarint(4), literal tag len 4, "abcd"
    assert _snappy_decompress(bytes([4, (3 << 2)]) + b"abcd", 4) == b"abcd"
    # literal 'ab' + copy1 len 6 off 2 -> "abababab"
    assert _snappy_decompress(bytes([8, (1 << 2)]) + b"ab" + bytes([0b01001, 2]), 8) == b"abababab"
    # copy2: literal 'xy' + copy2 len 4 off 2
    blob = bytes([6, (1 << 2)]) + b"xy" + bytes([(3 << 2) | 2, 2, 0])
    assert _snappy_decompress(blob, 6) == b"xyxyxy"
    # 61-byte literal needs the 1-extra-length-byte form (tag len 60)
    lit = bytes(range(61))
    blob = bytes([61, (60 << 2), 60]) + lit
    assert _snappy_decompress(blob, 61) == lit
    # malformed: zero offset
    with pytest.raises(ValueError):
        _snappy_decompress(bytes([8, (1 << 2)]) + b"ab" + bytes([0b01001, 0]), 8)
    # malformed: preamble mismatch
    with pytest.raises(ValueError):
        _snappy_decompress(bytes([5, (3 << 2)]) + b"abcd", 4)


def test_blosc_snappy_chunk_decode():
    """A hand-built blosc chunk with snappy streams decodes."""
    import struct

    from anemoi_models_tpu.training.zarr_store import _blosc_decompress

    raw = b"ab" * 41  # 82 bytes, one leftover block, single stream
    n = len(raw)
    # snappy: uvarint(82), literal 'ab', then 10 copy1 tags of len 8 off 2
    payload = bytes([n, (1 << 2)]) + b"ab"
    for _ in range(10):
        payload += bytes([((8 - 4) << 2) | 1, 2])
    flags = (2 << 5) | 0x10  # snappy format, DONT_SPLIT, no shuffle
    header = struct.pack("<BBBB", 2, 1, flags, 1)
    body = struct.pack("<i", len(payload)) + payload
    chunk = header + struct.pack("<iii", n, n, 16 + 4 + len(body)) + struct.pack("<i", 20) + body
    assert _blosc_decompress(chunk) == raw
