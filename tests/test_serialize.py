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


def test_wire_roundtrip_all_types(setup):
    """Framed wire format: every scheme-1 object roundtrips bit-exactly and
    the restored objects WORK (decrypt/bootstrap against the originals)."""
    params, ctx, sk, pk, msg, k_enc = setup
    bkey = F.BootstrapKey.create(ctx, sk, jax.random.key(5))
    ct = F.encrypt(sk, k_enc, msg)
    bits = F.split_ciphertext(ct)
    packed = F.pack_encrypted_bits(params, ctx, bkey, bits)
    opt = F.encrypt_optimal(sk, k_enc, msg)
    opt_pub = F.encrypt_optimal(pk, ctx, k_enc, msg)

    # keys
    sk2 = serialize.from_wire(serialize.to_wire(sk))
    assert (np.asarray(sk2.key) == np.asarray(sk.key)).all()
    pk2 = serialize.from_wire(serialize.to_wire(pk))
    assert (np.asarray(pk2.k0) == np.asarray(pk.k0)).all()
    assert (np.asarray(pk2.k1) == np.asarray(pk.k1)).all()
    bk2 = serialize.from_wire(serialize.to_wire(bkey))
    assert (np.asarray(bk2.hat) == np.asarray(bkey.hat)).all()
    assert (np.asarray(bk2.hat_shoup) == np.asarray(bkey.hat_shoup)).all()

    # ciphertexts
    ct2 = serialize.from_wire(serialize.to_wire(ct))
    assert (np.asarray(F.decrypt(sk2, ct2)) == np.asarray(msg)).all()
    pq2 = serialize.from_wire(serialize.to_wire(packed))
    assert type(pq2).__name__ == "Ciphertext"
    assert (np.asarray(F.decrypt(sk, pq2)) == np.asarray(msg)).all()
    eb2 = serialize.from_wire(serialize.to_wire(bits))
    assert (np.asarray(eb2.lwe.a) == np.asarray(bits.lwe.a)).all()
    assert (np.asarray(eb2.lwe.b) == np.asarray(bits.lwe.b)).all()
    one = F.EncryptedBit(F.LWE(bits.lwe.a[0], bits.lwe.b[0]))
    one2 = serialize.from_wire(serialize.to_wire(one))
    assert one2.lwe.a.ndim == 1
    assert (np.asarray(one2.lwe.a) == np.asarray(one.lwe.a)).all()
    o2 = serialize.from_wire(serialize.to_wire(opt))
    dec = F.decrypt(sk, F.normalize_ciphertext(o2))
    assert (np.asarray(dec) == np.asarray(msg)).all()
    op2 = serialize.from_wire(serialize.to_wire(opt_pub))
    dec = F.decrypt(sk, F.normalize_ciphertext(op2))
    assert (np.asarray(dec) == np.asarray(msg)).all()

    # wire sizes: RLWE ciphertext is log2(r) bits/coefficient + fixed header
    raw = serialize.to_wire(ct)
    w = params.r.bit_length() - 1
    assert len(raw) <= 2 * ((params.n * w + 7) // 8) + 64


def test_wire_corruption_detected(setup):
    params, ctx, sk, pk, msg, k_enc = setup
    raw = bytearray(serialize.to_wire(sk))
    raw[len(raw) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        serialize.from_wire(bytes(raw))
    # truncation is also caught
    with pytest.raises(ValueError):
        serialize.from_wire(bytes(raw[:10]))


def test_wire_short_input_clean_error():
    """Inputs shorter than the fixed header+CRC minimum must raise ValueError,
    not IndexError (round-2 advisor finding)."""
    for raw in (b"", b"SGFW", b"SGFW\x01\x06", b"x" * 19):
        with pytest.raises(ValueError):
            serialize.from_wire(raw)


def test_wire_encrypted_bit_nd_batch(setup):
    """EncryptedBit wire frames preserve ARBITRARY batch shapes (the old
    format flattened >2-D batches to (batch, n))."""
    params, ctx, sk, pk, msg, k_enc = setup
    rng = np.random.default_rng(7)
    for shape in [(), (5,), (2, 3), (2, 2, 2)]:
        a = jnp.asarray(
            rng.integers(0, params.r, size=shape + (params.n,), dtype=np.uint32)
        )
        b = jnp.asarray(rng.integers(0, params.r, size=shape, dtype=np.uint32))
        if shape == ():
            b = jnp.uint32(int(b))
        eb = F.EncryptedBit(F.LWE(a, b))
        eb2 = serialize.from_wire(serialize.to_wire(eb))
        assert np.asarray(eb2.lwe.a).shape == shape + (params.n,)
        np.testing.assert_array_equal(np.asarray(eb2.lwe.a), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(eb2.lwe.b), np.asarray(b))
