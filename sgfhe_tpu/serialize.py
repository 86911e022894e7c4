"""Serialization / checkpointing of keys and ciphertexts.

The reference defines compact bit encodings (PrivateEncryptedCiphertext:
6 bits/bit, src/fhe.jl:293-301; PublicEncryptedCiphertext: 10+log2(n)
bits/bit, src/fhe.jl:375-383) but ships no save/load (SURVEY.md §5
"Checkpoint/resume: none"). This module adds:

 - byte-exact packing of the space-optimal ciphertexts (numpy packbits,
   little-endian bit order within each field), matching the advertised sizes
 - npz checkpointing of every key/ciphertext/context object, with Params
   round-tripped from its integers (everything else is derived)
"""

from __future__ import annotations

import io
import json

import numpy as np
import jax.numpy as jnp

from . import native
from .models.params import Params
from .models import scheme1 as s1
from .models import scheme2 as s2


MAGIC = "sgfhe_tpu/v1"


# -- space-optimal ciphertext byte encodings --------------------------------


def private_ciphertext_to_bytes(ct: s1.PrivateEncryptedCiphertext) -> bytes:
    """6n bits -> ceil(6n/8) bytes (+ fixed header handled by caller)."""
    u = np.asarray(ct.u).astype(np.uint8)
    v = np.asarray(ct.v).astype(np.uint8)
    bits = np.concatenate([u.reshape(-1), v.reshape(-1)])
    return native.packbits(bits)  # C++ codec; numpy fallback inside


def private_ciphertext_from_bytes(params: Params, raw: bytes):
    n = params.n
    bits = native.unpackbits(raw, 6 * n)
    u = bits[:n]
    v = bits[n:].reshape(5, n)
    return s1.PrivateEncryptedCiphertext(params, jnp.asarray(u), jnp.asarray(v))


def public_ciphertext_to_bytes(ct: s1.PublicEncryptedCiphertext) -> bytes:
    a = np.asarray(ct.a_bits).astype(np.uint8)
    b = np.asarray(ct.b_bits).astype(np.uint8)
    bits = np.concatenate([a.reshape(-1), b.reshape(-1)])
    return native.packbits(bits)


def public_ciphertext_from_bytes(params: Params, raw: bytes):
    n = params.n
    count = (params.t + 1) * n + 6 * n
    bits = native.unpackbits(raw, count)
    a = bits[: (params.t + 1) * n].reshape(params.t + 1, n)
    b = bits[(params.t + 1) * n :].reshape(6, n)
    return s1.PublicEncryptedCiphertext(params, jnp.asarray(a), jnp.asarray(b))


# -- framed wire format (header + CRC32) ------------------------------------
#
# Frame: b"SGFW" | version u8 | type u8 | meta_len u16le | meta json |
#        payload_len u64le | payload | crc32 u32le (over all preceding bytes,
#        native/sgfhe_io.cpp CRC). Every scheme-1 object gets a framed
#        encoding; numeric payloads use the dense width-packed codec, so an
#        RLWE ciphertext costs log2(r) bits per coefficient and the bootstrap
#        key max(log2 p_i) bits per residue (its Shoup companions are
#        recomputed on load, halving the wire size).

_WIRE_MAGIC = b"SGFW"
_WIRE_VERSION = 1

_T_PRIVATE_KEY = 1
_T_PUBLIC_KEY = 2
_T_BOOTSTRAP_KEY = 3
_T_PACKED_CT = 4
_T_CIPHERTEXT = 5
_T_ENCRYPTED_BIT = 6
_T_PRIVATE_CT = 7
_T_PUBLIC_CT = 8
_T_S2_CIPHERTEXT = 9   # scheme-2 (a, b) digit-polynomial pair mod r
_T_S2_LWE = 10         # scheme-2 digit LWE batch (split/bootstrap outputs)
_T_BKEY_SEEDED = 11    # bootstrap key as (PRNG seed, b-column) — both schemes

# Current a-column regeneration stream per scheme (see
# bootstrap_key_to_wire_seeded): scheme 1 has always drawn one-shot from the
# seed (stream 1); scheme 2 moved to the chunked fold_in draw in round 4
# (stream 2) — pre-chunking scheme-2 frames must be rejected, not silently
# regenerated wrong.
_SEED_STREAM = {1: 1, 2: 2}


def _frame(type_code: int, meta: dict, payload: bytes) -> bytes:
    mb = json.dumps(meta, sort_keys=True).encode()
    head = (
        _WIRE_MAGIC
        + bytes([_WIRE_VERSION, type_code])
        + len(mb).to_bytes(2, "little")
        + mb
        + len(payload).to_bytes(8, "little")
    )
    body = head + payload
    return body + native.crc32(body).to_bytes(4, "little")


# magic(4) + version(1) + type(1) + meta_len(2) + payload_len(8) + crc(4)
_MIN_FRAME = 4 + 1 + 1 + 2 + 8 + 4


def _unframe(raw: bytes) -> tuple[int, dict, bytes]:
    if len(raw) < _MIN_FRAME:
        raise ValueError(
            f"wire frame too short: {len(raw)} bytes < the {_MIN_FRAME}-byte "
            f"header+CRC minimum"
        )
    if raw[:4] != _WIRE_MAGIC:
        raise ValueError("not an sgfhe wire frame (bad magic)")
    if raw[4] != _WIRE_VERSION:
        raise ValueError(f"unsupported wire version {raw[4]}")
    crc_stored = int.from_bytes(raw[-4:], "little")
    crc = native.crc32(raw[:-4])
    if crc != crc_stored:
        raise ValueError(
            f"wire CRC mismatch: stored {crc_stored:#010x}, computed {crc:#010x}"
        )
    type_code = raw[5]
    meta_len = int.from_bytes(raw[6:8], "little")
    off = 8 + meta_len
    if off + 8 > len(raw) - 4:
        raise ValueError("truncated wire frame")
    meta = json.loads(raw[8:off].decode())
    payload_len = int.from_bytes(raw[off : off + 8], "little")
    payload = raw[off + 8 : off + 8 + payload_len]
    if len(payload) != payload_len:
        raise ValueError("truncated wire frame")
    return type_code, meta, payload


def _r_bits(params: Params) -> int:
    return params.r.bit_length() - 1  # r is a power of two


def to_wire(obj) -> bytes:
    """Serialize a scheme-1 object to a self-describing CRC-checked frame."""
    if isinstance(obj, s1.PrivateKey):
        p = obj.params
        return _frame(_T_PRIVATE_KEY, {"n": p.n},
                      native.packbits(np.asarray(obj.key).astype(np.uint8)))
    if isinstance(obj, s1.PublicKey):
        p = obj.params
        # RNS-q keys (n = 8192) store (Lq, n) residue stacks; width covers
        # the largest factor
        w = max(q.bit_length() for q in p.q_factors)
        payload = (native.pack_uint(np.asarray(obj.k0), w)
                   + native.pack_uint(np.asarray(obj.k1), w))
        return _frame(_T_PUBLIC_KEY, {"n": p.n}, payload)
    if isinstance(obj, s1.BootstrapKey):
        p = obj.params
        w = max(q.bit_length() for q in p.moduli)
        payload = native.pack_uint(np.asarray(obj.hat), w)
        return _frame(_T_BOOTSTRAP_KEY, {"n": p.n}, payload)
    if isinstance(obj, (s1.PackedCiphertext, s1.Ciphertext)):
        p = obj.params
        code = _T_PACKED_CT if isinstance(obj, s1.PackedCiphertext) else _T_CIPHERTEXT
        w = _r_bits(p)
        payload = (native.pack_uint(np.asarray(obj.rlwe.a), w)
                   + native.pack_uint(np.asarray(obj.rlwe.b), w))
        return _frame(code, {"n": p.n}, payload)
    if isinstance(obj, s1.EncryptedBit):
        a = np.asarray(obj.lwe.a)
        b = np.asarray(obj.lwe.b)
        n = a.shape[-1]
        bshape = list(a.shape[:-1])
        if list(b.shape) != bshape:
            raise ValueError(
                f"EncryptedBit a/b batch shapes disagree: {a.shape[:-1]} vs "
                f"{b.shape}"
            )
        rows = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
        # width: bits must cover mod-r values; n determines r = 16n
        w = (16 * n).bit_length() - 1
        payload = native.pack_uint(a.reshape(rows * n), w) + native.pack_uint(
            np.atleast_1d(b).reshape(rows), w
        )
        # the FULL batch shape rides the meta, so >2-D batches roundtrip
        return _frame(_T_ENCRYPTED_BIT, {"n": n, "shape": bshape}, payload)
    if isinstance(obj, s1.PrivateEncryptedCiphertext):
        return _frame(_T_PRIVATE_CT, {"n": obj.params.n},
                      private_ciphertext_to_bytes(obj))
    if isinstance(obj, s1.PublicEncryptedCiphertext):
        return _frame(_T_PUBLIC_CT, {"n": obj.params.n},
                      public_ciphertext_to_bytes(obj))
    raise TypeError(f"no wire format for {type(obj)}")


def s2_ciphertext_to_wire(params: "s2.Params", a, b) -> bytes:
    """Scheme-2 digit-polynomial ciphertext (the bare (a, b) pair the
    scheme-2 encrypt returns, reference src/fhe2.jl:165-210) -> wire frame.
    log2(r) bits per coefficient."""
    w = params.r.bit_length() - 1
    a = np.asarray(a)
    b = np.asarray(b)
    payload = native.pack_uint(a.reshape(-1), w) + native.pack_uint(
        b.reshape(-1), w
    )
    return _frame(
        _T_S2_CIPHERTEXT, {"k": params.k, "n": params.n}, payload
    )


def s2_lwe_to_wire(params: "s2.Params", lwe) -> bytes:
    """Scheme-2 digit LWE batch (split_ciphertext / bootstrap outputs)."""
    a = np.asarray(lwe.a)
    b = np.asarray(lwe.b)
    n = a.shape[-1]
    bshape = list(a.shape[:-1])
    if list(b.shape) != bshape:
        raise ValueError(
            f"LWE a/b batch shapes disagree: {a.shape[:-1]} vs {b.shape}"
        )
    rows = int(np.prod(bshape, dtype=np.int64)) if bshape else 1
    w = params.r.bit_length() - 1
    payload = native.pack_uint(a.reshape(rows * n), w) + native.pack_uint(
        np.atleast_1d(b).reshape(rows), w
    )
    return _frame(
        _T_S2_LWE,
        {"k": params.k, "n": params.n, "shape": bshape},
        payload,
    )


def bootstrap_key_to_wire_seeded(bkey) -> bytes:
    """Seeded bootstrap-key wire format (scheme 1 or 2): the PRNG seed plus
    the b-column residues only — half the bytes of `to_wire(bkey)` (which
    itself ships no Shoup companions). The uniform a-column regenerates
    from the seed on load (the gadget terms live entirely on the b-column,
    models/scheme1.py `_bkey_kernel`), at the cost of one forward NTT and
    the Shoup recompute. Standard seeded-RLWE compression, beyond the
    reference's encodings (src/fhe.jl:293-301)."""
    if bkey.seed is None:
        raise ValueError(
            "bootstrap key carries no seed (loaded from a non-seeded "
            "checkpoint?) — use to_wire instead"
        )
    p = bkey.params
    scheme = 2 if isinstance(p, s2.Params) else 1
    w = max(q.bit_length() for q in p.moduli)
    seed = np.asarray(bkey.seed, dtype=np.uint32)
    b_hat = np.asarray(bkey.hat[:, :, 1])
    payload = seed.tobytes() + native.pack_uint(b_hat.reshape(-1), w)
    # "stream" versions the a-column regeneration recipe: a seeded frame is
    # only as good as the PRNG stream that rebuilds its a-column, so a
    # stream change MUST fail loudly at load time instead of silently
    # regenerating a mismatched key (decrypt-garbage with no error).
    # Scheme-2 stream 2 = the chunked draw (chunk c <- fold_in(k_a, c),
    # BootstrapKey.KEY_CHUNK); stream 1 was the pre-chunking one-shot draw.
    meta = {
        "scheme": scheme, "n": p.n, "seedwords": int(seed.size),
        "stream": _SEED_STREAM[scheme],
    }
    if scheme == 2:
        meta["k"] = p.k
    return _frame(_T_BKEY_SEEDED, meta, payload)


def from_wire(raw: bytes, ctx=None):
    """Parse a wire frame back into its object (CRC verified).

    `ctx`: optional SchemeContext/Scheme2Context, consulted only by the
    seeded bootstrap-key format (which must NTT the regenerated a-column;
    without it a fresh context is built from the frame's params)."""
    type_code, meta, payload = _unframe(raw)
    if type_code == _T_BKEY_SEEDED:
        scheme = meta.get("scheme", 1)
        stream = meta.get("stream", 1)
        if stream != _SEED_STREAM[scheme]:
            raise ValueError(
                f"seeded bootstrap-key frame uses a-column stream version "
                f"{stream}, but this build regenerates stream "
                f"{_SEED_STREAM[scheme]} for scheme {scheme} — loading would "
                f"silently rebuild a mismatched key. Re-export the key from "
                f"a build that writes stream {_SEED_STREAM[scheme]}, or use "
                f"the full (non-seeded) wire format."
            )
        if scheme == 2:
            prm = s2.Params.create(meta["k"], n=meta["n"])
            mod = s2
            c = ctx if ctx is not None else s2.make_context(prm)
        else:
            prm = Params.create(meta["n"])
            mod = s1
            c = ctx if ctx is not None else s1.make_context(prm)
        nseed = 4 * meta["seedwords"]
        seed = np.frombuffer(payload[:nseed], dtype=np.uint32).copy()
        w = max(q.bit_length() for q in prm.moduli)
        n, l, L, m = prm.n, prm.num_digits, prm.num_limbs, prm.m
        count = n * 2 * l * L * m
        b_hat = native.unpack_uint(payload[nseed:], count, w).reshape(
            n, 2 * l, L, m
        )
        return mod.BootstrapKey.from_seeded(prm, c, seed, jnp.asarray(b_hat))
    if type_code == _T_S2_CIPHERTEXT:
        p2 = s2.Params.create(meta["k"], n=meta["n"])
        w = p2.r.bit_length() - 1
        a_bytes = (p2.n * w + 7) // 8
        a = native.unpack_uint(payload[:a_bytes], p2.n, w)
        b = native.unpack_uint(payload[a_bytes:], p2.n, w)
        return p2, jnp.asarray(a), jnp.asarray(b)
    if type_code == _T_S2_LWE:
        p2 = s2.Params.create(meta["k"], n=meta["n"])
        n = p2.n
        bshape = tuple(meta["shape"])
        rows = 1
        for d in bshape:
            rows *= d
        w = p2.r.bit_length() - 1
        a_bytes = (rows * n * w + 7) // 8
        a = native.unpack_uint(payload[:a_bytes], rows * n, w)
        b = native.unpack_uint(payload[a_bytes:], rows, w)
        if not bshape:
            return p2, s1.LWE(jnp.asarray(a), jnp.asarray(b[0]))
        return p2, s1.LWE(
            jnp.asarray(a.reshape(bshape + (n,))), jnp.asarray(b.reshape(bshape))
        )
    if type_code == _T_ENCRYPTED_BIT:
        n = meta["n"]
        if "shape" in meta:
            bshape = tuple(meta["shape"])
        else:  # frames written before the shape field: 1-D batch or scalar
            legacy = meta.get("batch", 0)
            bshape = (legacy,) if legacy else ()
        rows = 1
        for d in bshape:
            rows *= d
        w = (16 * n).bit_length() - 1
        a_bytes = (rows * n * w + 7) // 8
        a = native.unpack_uint(payload[:a_bytes], rows * n, w)
        b = native.unpack_uint(payload[a_bytes:], rows, w)
        if not bshape:
            return s1.EncryptedBit(
                s1.LWE(jnp.asarray(a), jnp.asarray(b[0]))
            )
        return s1.EncryptedBit(
            s1.LWE(jnp.asarray(a.reshape(bshape + (n,))),
                   jnp.asarray(b.reshape(bshape)))
        )
    params = Params.create(meta["n"])
    if type_code == _T_PRIVATE_KEY:
        bits = native.unpackbits(payload, params.n)
        return s1.PrivateKey(params, jnp.asarray(bits.astype(np.uint32)))
    if type_code == _T_PUBLIC_KEY:
        w = max(q.bit_length() for q in params.q_factors)
        Lq = len(params.q_factors)
        cnt = Lq * params.n
        half = (cnt * w + 7) // 8
        shape = (params.n,) if Lq == 1 else (Lq, params.n)
        k0 = native.unpack_uint(payload[:half], cnt, w).reshape(shape)
        k1 = native.unpack_uint(payload[half:], cnt, w).reshape(shape)
        return s1.PublicKey(params, jnp.asarray(k0), jnp.asarray(k1))
    if type_code == _T_BOOTSTRAP_KEY:
        n, l, L, m = (params.n, params.num_digits, params.num_limbs, params.m)
        w = max(q.bit_length() for q in params.moduli)
        count = n * 2 * l * 2 * L * m
        hat = native.unpack_uint(payload, count, w).reshape(n, 2 * l, 2, L, m)
        mods = np.array(params.moduli, dtype=np.uint64).reshape(1, 1, 1, L, 1)
        shoup = ((hat.astype(np.uint64) << np.uint64(32)) // mods).astype(
            np.uint32
        )
        return s1.BootstrapKey(params, jnp.asarray(hat), jnp.asarray(shoup))
    if type_code in (_T_PACKED_CT, _T_CIPHERTEXT):
        length = params.n if type_code == _T_PACKED_CT else params.m
        w = _r_bits(params)
        a_bytes = (length * w + 7) // 8
        a = native.unpack_uint(payload[:a_bytes], length, w)
        b = native.unpack_uint(payload[a_bytes:], length, w)
        cls = s1.PackedCiphertext if type_code == _T_PACKED_CT else s1.Ciphertext
        return cls(params, s1.RLWE(jnp.asarray(a), jnp.asarray(b)))
    if type_code == _T_PRIVATE_CT:
        return private_ciphertext_from_bytes(params, payload)
    if type_code == _T_PUBLIC_CT:
        return public_ciphertext_from_bytes(params, payload)
    raise ValueError(f"unknown wire type code {type_code}")


# -- key / object checkpointing ---------------------------------------------


def _params_meta(params) -> str:
    if isinstance(params, Params):
        return json.dumps({"scheme": 1, "n": params.n})
    if isinstance(params, s2.Params):
        return json.dumps({"scheme": 2, "k": params.k, "n": params.n})
    raise TypeError(type(params))


def _params_from_meta(meta: str):
    d = json.loads(meta)
    if d["scheme"] == 1:
        return Params.create(d["n"])
    # "n" absent in pre-r3 checkpoints (always the paper's default 1024)
    return s2.Params.create(d["k"], n=d.get("n"))


_SAVERS = {
    s1.PrivateKey: lambda o: {"key": np.asarray(o.key)},
    s1.PublicKey: lambda o: {"k0": np.asarray(o.k0), "k1": np.asarray(o.k1)},
    s1.BootstrapKey: lambda o: {
        "hat": np.asarray(o.hat), "hat_shoup": np.asarray(o.hat_shoup)
    },
    s2.PrivateKey: lambda o: {"key": np.asarray(o.key)},
    s2.PublicKey: lambda o: {"k0": np.asarray(o.k0), "k1": np.asarray(o.k1)},
    s2.BootstrapKey: lambda o: {
        "hat": np.asarray(o.hat), "hat_shoup": np.asarray(o.hat_shoup)
    },
}


def save(path: str, obj) -> None:
    """Checkpoint a key object to .npz (works for scheme-1 and scheme-2)."""
    tp = type(obj)
    if tp not in _SAVERS:
        raise TypeError(f"cannot serialize {tp}")
    arrays = _SAVERS[tp](obj)
    np.savez_compressed(
        path,
        __magic__=np.frombuffer(MAGIC.encode(), dtype=np.uint8),
        __type__=np.frombuffer(tp.__name__.encode(), dtype=np.uint8),
        __params__=np.frombuffer(_params_meta(obj.params).encode(), dtype=np.uint8),
        **arrays,
    )


def load(path: str):
    """Restore a key object saved with `save` (Params re-derived)."""
    with np.load(path) as z:
        magic = z["__magic__"].tobytes().decode()
        assert magic == MAGIC, f"bad magic {magic!r}"
        tname = z["__type__"].tobytes().decode()
        params = _params_from_meta(z["__params__"].tobytes().decode())
        mod = s2 if isinstance(params, s2.Params) else s1
        cls = getattr(mod, tname)
        fields = {
            k: jnp.asarray(v) for k, v in z.items() if not k.startswith("__")
        }
        return cls(params, **fields)
