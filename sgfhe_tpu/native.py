"""ctypes binding for the native IO codec (native/sgfhe_io.cpp).

Builds `native/libsgfhe_io.so` on first use if a compiler is present; every
entry point has a numpy fallback so the package works without a toolchain.
The reference has no native layer at all (SURVEY.md §2.1) — this is the
framework's host-side runtime IO path (ciphertext wire formats, integrity
checks); device compute is Pallas/XLA.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libsgfhe_io.so"))
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.sgfhe_packbits.argtypes = [u8p, ctypes.c_size_t, u8p]
        lib.sgfhe_unpackbits.argtypes = [u8p, ctypes.c_size_t, u8p]
        lib.sgfhe_pack_uint.argtypes = [u32p, ctypes.c_size_t, ctypes.c_uint, u8p]
        lib.sgfhe_unpack_uint.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint, u32p]
        lib.sgfhe_crc32.argtypes = [u8p, ctypes.c_size_t, ctypes.c_uint32]
        lib.sgfhe_crc32.restype = ctypes.c_uint32
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def packbits(bits: np.ndarray) -> bytes:
    """Little-endian bit packing (== np.packbits(bitorder='little'))."""
    bits = np.ascontiguousarray(bits.reshape(-1), dtype=np.uint8)
    lib = _load()
    if lib is None:
        return np.packbits(bits, bitorder="little").tobytes()
    out = np.zeros((bits.size + 7) // 8, dtype=np.uint8)
    lib.sgfhe_packbits(
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), bits.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.tobytes()


def unpackbits(data: bytes, n_bits: int) -> np.ndarray:
    lib = _load()
    buf = np.frombuffer(data, dtype=np.uint8)
    if lib is None:
        return np.unpackbits(buf, count=n_bits, bitorder="little")
    out = np.zeros(n_bits, dtype=np.uint8)
    lib.sgfhe_unpackbits(
        np.ascontiguousarray(buf).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8)
        ),
        n_bits,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out


def pack_uint(vals: np.ndarray, width: int) -> bytes:
    """Dense little-endian packing of `width`-bit values (uint32 input)."""
    vals = np.ascontiguousarray(vals.reshape(-1), dtype=np.uint32)
    n_bytes = (vals.size * width + 7) // 8
    lib = _load()
    if lib is None:
        bits = (
            (vals[:, None] >> np.arange(width, dtype=np.uint32)) & 1
        ).astype(np.uint8)
        return np.packbits(bits.reshape(-1), bitorder="little").tobytes()
    out = np.zeros(n_bytes, dtype=np.uint8)
    lib.sgfhe_pack_uint(
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), vals.size,
        width, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.tobytes()


def unpack_uint(data: bytes, count: int, width: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8), count=count * width,
            bitorder="little",
        ).reshape(count, width).astype(np.uint32)
        return (bits << np.arange(width, dtype=np.uint32)).sum(
            axis=1, dtype=np.uint32
        )
    buf = np.ascontiguousarray(np.frombuffer(data, dtype=np.uint8))
    out = np.zeros(count, dtype=np.uint32)
    lib.sgfhe_unpack_uint(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), count, width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
    )
    return out


def crc32(data: bytes, seed: int = 0) -> int:
    lib = _load()
    if lib is None:
        import zlib

        return zlib.crc32(data, seed) & 0xFFFFFFFF
    buf = np.frombuffer(data, dtype=np.uint8)
    return int(
        lib.sgfhe_crc32(
            np.ascontiguousarray(buf).ctypes.data_as(
                ctypes.POINTER(ctypes.c_uint8)
            ),
            len(data), seed,
        )
    )
