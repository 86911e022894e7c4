"""Noise-budget instrumentation — first-class debug facility.

FHE's failure mode is silent noise overflow, not crashes; the reference ships
this only as an example script (`examples/errors.jl:52-56` `lwe_error`,
measuring empirical error against the paper's bounds). Here it is a library
API (SURVEY.md §5 calls this the analog of a sanitizer).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.params import Params
from ..models.scheme1 import EncryptedBit, PrivateKey, LWE


def lwe_error(sk: PrivateKey, enc_bit: EncryptedBit, expected_bit) -> np.ndarray:
    """Signed noise of an LWE ciphertext given the secret key: the distance of
    (b - <a, s>) from expected_bit * Dr, centered into (-r/2, r/2].

    A healthy post-bootstrap ciphertext has |error| << Dr/2 (= the decision
    boundary); the paper's bound is Dr/4 (reference examples/errors.jl:103-127).
    """
    params = sk.params
    mask = params.mask_r
    a = np.asarray(enc_bit.lwe.a).astype(np.int64)
    b = np.asarray(enc_bit.lwe.b).astype(np.int64)
    s = np.asarray(sk.key).astype(np.int64)
    expected = np.asarray(expected_bit).astype(np.int64)
    phase = (b - (a * s).sum(axis=-1)) % params.r
    err = (phase - expected * params.Dr) % params.r
    return np.where(err > params.r // 2, err - params.r, err)


def rlwe_error(sk: PrivateKey, ct, message) -> np.ndarray:
    """Per-coefficient signed noise of a Packed/packed Ciphertext."""
    params = sk.params
    a = np.asarray(ct.rlwe.a).astype(np.int64)
    b = np.asarray(ct.rlwe.b).astype(np.int64)
    length = a.shape[-1]
    s = np.zeros(length, dtype=np.int64)
    s[: params.n] = np.asarray(sk.key)
    # exact negacyclic conv s * a mod r
    conv = np.zeros(length, dtype=np.int64)
    idx = np.arange(length)
    for i in np.nonzero(s)[0]:
        k = (idx + i) % length
        sgn = np.where(idx + i >= length, -1, 1)
        np.add.at(conv, k, sgn * a[idx])
    phase = (b - conv) % params.r
    msg = np.zeros(length, dtype=np.int64)
    msg[: params.n] = np.asarray(message).astype(np.int64)
    err = (phase - msg * params.Dr) % params.r
    return np.where(err > params.r // 2, err - params.r, err)[: params.n]


def noise_budget_report(sk: PrivateKey, enc_bit: EncryptedBit, expected_bit) -> dict:
    """Summary stats in units of the decision boundary Dr/2."""
    err = lwe_error(sk, enc_bit, expected_bit)
    params = sk.params
    bound = params.Dr / 2
    return {
        "max_abs": int(np.abs(err).max()),
        "mean_abs": float(np.abs(err).mean()),
        "boundary": int(bound),
        "headroom_bits": float(np.log2(bound / max(1, np.abs(err).max()))),
        "paper_bound": params.Dr // 4,
        "ok": bool(np.abs(err).max() < bound),
    }
