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


# -- key / object checkpointing ---------------------------------------------


def _params_meta(params) -> str:
    if isinstance(params, Params):
        return json.dumps({"scheme": 1, "n": params.n})
    if isinstance(params, s2.Params):
        return json.dumps({"scheme": 2, "k": params.k})
    raise TypeError(type(params))


def _params_from_meta(meta: str):
    d = json.loads(meta)
    if d["scheme"] == 1:
        return Params.create(d["n"])
    return s2.Params.create(d["k"])


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
