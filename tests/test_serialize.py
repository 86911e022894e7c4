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


def test_wire_scheme2_ciphertext_roundtrip():
    """Scheme-2 (a, b) digit-polynomial ciphertexts roundtrip over the wire
    at log2(r) bits/coefficient and the restored pair still decrypts."""
    from sgfhe_tpu.models import scheme2 as s2

    params = s2.Params.create(1, n=64)
    sk = s2.PrivateKey.create(params, jax.random.key(1))
    msg = jax.random.randint(jax.random.key(2), (params.n,), 0, 2**params.k)
    a, b = s2.encrypt(sk, jax.random.key(3), msg)

    raw = serialize.s2_ciphertext_to_wire(params, a, b)
    w = params.r.bit_length() - 1
    assert len(raw) <= 2 * ((params.n * w + 7) // 8) + 96
    p2, a2, b2 = serialize.from_wire(raw)
    assert p2.k == params.k and p2.n == params.n
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a))
    np.testing.assert_array_equal(np.asarray(b2), np.asarray(b))
    dec = np.asarray(s2.decrypt(sk, a2, b2))
    np.testing.assert_array_equal(dec, np.asarray(msg))


def test_wire_scheme2_lwe_roundtrip():
    """Scheme-2 digit LWEs (split_ciphertext / bootstrap outputs) roundtrip
    for scalar, 1-D, and 2-D batch shapes."""
    from sgfhe_tpu.models import scheme2 as s2
    from sgfhe_tpu.models import bootstrap2 as b2

    params = s2.Params.create(2, n=64)
    rng = np.random.default_rng(11)
    for shape in [(), (5,), (3, 4)]:
        a = jnp.asarray(
            rng.integers(0, params.r, size=shape + (params.n,), dtype=np.uint32)
        )
        b = jnp.asarray(rng.integers(0, params.r, size=shape, dtype=np.uint32))
        if shape == ():
            b = jnp.uint32(int(b))
        lwe = F.LWE(a, b)
        p2, lwe2 = serialize.from_wire(serialize.s2_lwe_to_wire(params, lwe))
        assert p2.k == params.k and p2.n == params.n
        assert np.asarray(lwe2.a).shape == shape + (params.n,)
        np.testing.assert_array_equal(np.asarray(lwe2.a), np.asarray(a))
        np.testing.assert_array_equal(np.asarray(lwe2.b), np.asarray(b))

    # a real split_ciphertext output survives the wire and still decrypts
    sk = s2.PrivateKey.create(params, jax.random.key(4))
    msg = jax.random.randint(jax.random.key(5), (params.n,), 0, 2**params.k)
    a, b = s2.encrypt(sk, jax.random.key(6), msg)
    lwes = b2.split_ciphertext(params, a, b)
    _, lwes2 = serialize.from_wire(serialize.s2_lwe_to_wire(params, lwes))
    dec = np.asarray(b2.decrypt_lwe(sk, lwes2))
    np.testing.assert_array_equal(dec, np.asarray(msg))


def test_wire_scheme2_lwe_shape_mismatch():
    from sgfhe_tpu.models import scheme2 as s2

    params = s2.Params.create(1, n=64)
    a = jnp.zeros((4, params.n), jnp.uint32)
    b = jnp.zeros((3,), jnp.uint32)
    with pytest.raises(ValueError, match="batch shapes"):
        serialize.s2_lwe_to_wire(params, F.LWE(a, b))


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


def test_wire_bootstrap_key_seeded(setup):
    """Seeded bootstrap-key wire: seed + b-column only. The restored key
    must be BIT-IDENTICAL (hat and Shoup) to the original, at about half
    the non-seeded wire size."""
    params, ctx, sk, pk, msg, k_enc = setup
    bkey = F.BootstrapKey.create(ctx, sk, jax.random.key(5))
    assert bkey.seed is not None

    raw_full = serialize.to_wire(bkey)
    raw_seed = serialize.bootstrap_key_to_wire_seeded(bkey)
    assert len(raw_seed) < 0.55 * len(raw_full)

    bk2 = serialize.from_wire(raw_seed, ctx=ctx)
    np.testing.assert_array_equal(np.asarray(bk2.hat), np.asarray(bkey.hat))
    np.testing.assert_array_equal(
        np.asarray(bk2.hat_shoup), np.asarray(bkey.hat_shoup)
    )
    np.testing.assert_array_equal(bk2.seed, bkey.seed)

    # without ctx a fresh context is built internally
    bk3 = serialize.from_wire(raw_seed)
    np.testing.assert_array_equal(np.asarray(bk3.hat), np.asarray(bkey.hat))

    # a key restored from the full (non-seeded) wire has no seed
    bk4 = serialize.from_wire(raw_full)
    assert bk4.seed is None
    with pytest.raises(ValueError, match="seed"):
        serialize.bootstrap_key_to_wire_seeded(bk4)


def test_wire_bootstrap_key_seeded_scheme2():
    from sgfhe_tpu.models import scheme2 as s2

    params = s2.Params.create(1, n=64)
    ctx = s2.make_context(params)
    sk = s2.PrivateKey.create(params, jax.random.key(1))
    bkey = s2.BootstrapKey.create(ctx, sk, jax.random.key(2))
    raw = serialize.bootstrap_key_to_wire_seeded(bkey)
    bk2 = serialize.from_wire(raw, ctx=ctx)
    assert bk2.params.k == params.k and bk2.params.n == params.n
    np.testing.assert_array_equal(np.asarray(bk2.hat), np.asarray(bkey.hat))
    np.testing.assert_array_equal(
        np.asarray(bk2.hat_shoup), np.asarray(bkey.hat_shoup)
    )
