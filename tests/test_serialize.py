"""Serialization: space-optimal ciphertext byte encodings hit the advertised
sizes (reference src/fhe.jl:293-301: 6 bits/bit; :375-383: 10+log2(n)
bits/bit) and roundtrip exactly; key checkpoints restore working objects."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu import serialize


@pytest.fixture(scope="module")
def setup():
    params = F.Params.create(64)
    ctx = F.make_context(params)
    key = jax.random.key(42)
    k_sk, k_pk, k_msg, k_enc = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    pk = F.PublicKey.create(ctx, sk, k_pk)
    msg = jax.random.bernoulli(k_msg, 0.5, (params.n,))
    return params, ctx, sk, pk, msg, k_enc


def test_private_optimal_bytes_roundtrip(setup):
    params, ctx, sk, pk, msg, k_enc = setup
    ct = F.encrypt_optimal(sk, k_enc, msg)
    raw = serialize.private_ciphertext_to_bytes(ct)
    assert len(raw) == (6 * params.n + 7) // 8  # 6 bits per message bit
    back = serialize.private_ciphertext_from_bytes(params, raw)
    dec = F.decrypt(sk, F.normalize_ciphertext(back))
    assert (np.asarray(dec) == np.asarray(msg)).all()


def test_public_optimal_bytes_roundtrip(setup):
    params, ctx, sk, pk, msg, k_enc = setup
    ct = F.encrypt_optimal(pk, ctx, k_enc, msg)
    raw = serialize.public_ciphertext_to_bytes(ct)
    bits_per_bit = (params.t + 1) + 6  # = 10 + log2(n)
    assert bits_per_bit == 10 + params.n.bit_length() - 1
    assert len(raw) == (bits_per_bit * params.n + 7) // 8
    back = serialize.public_ciphertext_from_bytes(params, raw)
    dec = F.decrypt(sk, F.normalize_ciphertext(back))
    assert (np.asarray(dec) == np.asarray(msg)).all()


def test_key_checkpoint_roundtrip(tmp_path, setup):
    params, ctx, sk, pk, msg, k_enc = setup
    path = str(tmp_path / "sk.npz")
    serialize.save(path, sk)
    sk2 = serialize.load(path)
    assert (np.asarray(sk2.key) == np.asarray(sk.key)).all()
    # the restored key decrypts a fresh ciphertext
    ct = F.encrypt(sk, k_enc, msg)
    assert (np.asarray(F.decrypt(sk2, ct)) == np.asarray(msg)).all()

    path2 = str(tmp_path / "pk.npz")
    serialize.save(path2, pk)
    pk2 = serialize.load(path2)
    assert (np.asarray(pk2.k0) == np.asarray(pk.k0)).all()
