"""Native IO codec (native/sgfhe_io.cpp via ctypes) vs numpy references."""

import zlib

import numpy as np
import pytest

from sgfhe_tpu import native


def test_native_builds_and_loads():
    assert native.available(), "native lib should build (g++ is in the image)"


def test_packbits_roundtrip_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (1, 7, 8, 9, 64, 1000):
        bits = rng.integers(0, 2, size=n).astype(np.uint8)
        packed = native.packbits(bits)
        assert packed == np.packbits(bits, bitorder="little").tobytes()
        back = native.unpackbits(packed, n)
        np.testing.assert_array_equal(back, bits)


def test_pack_uint_roundtrip():
    rng = np.random.default_rng(1)
    for width in (1, 5, 6, 11, 21, 32):
        vals = rng.integers(0, 1 << min(width, 31), size=100, dtype=np.int64)
        vals = vals.astype(np.uint32)
        data = native.pack_uint(vals, width)
        assert len(data) == (100 * width + 7) // 8
        back = native.unpack_uint(data, 100, width)
        np.testing.assert_array_equal(back, vals)


def test_crc32_matches_zlib():
    rng = np.random.default_rng(2)
    for n in (0, 1, 13, 1024):
        data = rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
        assert native.crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)
