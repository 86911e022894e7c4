"""Black-box API tests mirroring reference test/api.test.jl:

 - encrypt_optimal -> normalize -> decrypt roundtrips (private + public)
 - split_ciphertext -> per-bit decrypt
 - bootstrap: every adjacent bit pair, AND/OR/XOR vs plaintext logic,
   deterministic AND randomized flattening
 - pack_encrypted_bits: decrypt directly and via re-split

The reference runs roundtrips at n=512 and gates at n=64 (test/api.test.jl:8,45);
we do the same.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F


@pytest.fixture(scope="module")
def setup64():
    params = F.Params.create(64)
    ctx = F.make_context(params)
    key = jax.random.key(1234)
    k_sk, k_bk = jax.random.split(key)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)
    return params, ctx, sk, bkey


@pytest.fixture(scope="module")
def setup512():
    params = F.Params.create(512)
    ctx = F.make_context(params)
    key = jax.random.key(99)
    sk = F.PrivateKey.create(params, key)
    return params, ctx, sk


def _random_bits(seed, n):
    return np.asarray(
        jax.random.bernoulli(jax.random.key(seed), 0.5, (n,))
    )


def test_private_roundtrip_512(setup512):
    params, ctx, sk = setup512
    msg = _random_bits(1, params.n)
    ct = F.encrypt(sk, jax.random.key(2), jnp.asarray(msg))
    assert (np.asarray(F.decrypt(sk, ct)) == msg).all()


def test_private_optimal_roundtrip_512(setup512):
    params, ctx, sk = setup512
    msg = _random_bits(3, params.n)
    ct = F.encrypt_optimal(sk, jax.random.key(4), jnp.asarray(msg))
    # 6 bits per message bit: u is n bits, v is 5n bits
    assert ct.u.shape == (params.n,)
    assert ct.v.shape == (5, params.n)
    norm = F.normalize_ciphertext(ct)
    assert (np.asarray(F.decrypt(sk, norm)) == msg).all()


def test_public_roundtrip_512(setup512):
    params, ctx, sk = setup512
    pk = F.PublicKey.create(ctx, sk, jax.random.key(5))
    msg = _random_bits(6, params.n)
    ct = F.encrypt_public(pk, ctx, jax.random.key(7), jnp.asarray(msg))
    assert (np.asarray(F.decrypt(sk, ct)) == msg).all()
    # uniform dispatch over key types, like the reference's `encrypt`
    # (src/fhe.jl:369-372 / 459-461)
    ct2 = F.encrypt(pk, ctx, jax.random.key(7), jnp.asarray(msg))
    np.testing.assert_array_equal(np.asarray(ct.rlwe.a), np.asarray(ct2.rlwe.a))
    np.testing.assert_array_equal(np.asarray(ct.rlwe.b), np.asarray(ct2.rlwe.b))


def test_public_optimal_roundtrip_512(setup512):
    params, ctx, sk = setup512
    pk = F.PublicKey.create(ctx, sk, jax.random.key(8))
    msg = _random_bits(9, params.n)
    ct = F.encrypt_optimal(pk, ctx, jax.random.key(10), jnp.asarray(msg))
    assert ct.a_bits.shape == (params.t + 1, params.n)
    assert ct.b_bits.shape == (6, params.n)
    norm = F.normalize_ciphertext(ct)
    assert (np.asarray(F.decrypt(sk, norm)) == msg).all()


def test_split_roundtrip_512(setup512):
    params, ctx, sk = setup512
    msg = _random_bits(11, params.n)
    ct = F.encrypt(sk, jax.random.key(12), jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    assert (np.asarray(F.decrypt_bit(sk, bits)) == msg).all()


@pytest.mark.parametrize("randomized", [False, True], ids=["det", "rand"])
def test_bootstrap_gates(setup64, randomized):
    params, ctx, sk, bkey = setup64
    msg = _random_bits(13, params.n)
    ct = F.encrypt(sk, jax.random.key(14), jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    lwe1 = F.LWE(bits.lwe.a[0::2], bits.lwe.b[0::2])
    lwe2 = F.LWE(bits.lwe.a[1::2], bits.lwe.b[1::2])
    fk = jax.random.key(15) if randomized else None
    and_l, or_l, xor_l = F.bootstrap_batch(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, randomized
    )
    y1, y2 = msg[0::2], msg[1::2]
    assert (np.asarray(F.decrypt_bit(sk, F.EncryptedBit(and_l))) == (y1 & y2)).all()
    assert (np.asarray(F.decrypt_bit(sk, F.EncryptedBit(or_l))) == (y1 | y2)).all()
    assert (np.asarray(F.decrypt_bit(sk, F.EncryptedBit(xor_l))) == (y1 ^ y2)).all()


def test_bootstrap_deterministic_reproducible(setup64):
    """rng=nothing analog: the deterministic path is bit-reproducible
    (reference docs/src/manual.md:156-172)."""
    params, ctx, sk, bkey = setup64
    msg = _random_bits(16, params.n)
    ct = F.encrypt(sk, jax.random.key(17), jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    lwe1 = F.LWE(bits.lwe.a[0::2], bits.lwe.b[0::2])
    lwe2 = F.LWE(bits.lwe.a[1::2], bits.lwe.b[1::2])
    r1 = F.bootstrap_batch(params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2)
    r2 = F.bootstrap_batch(params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2)
    for l1, l2 in zip(r1, r2):
        np.testing.assert_array_equal(np.asarray(l1.a), np.asarray(l2.a))
        np.testing.assert_array_equal(np.asarray(l1.b), np.asarray(l2.b))


def test_randomized_mask_epoch(setup64):
    """Mask-replay hazard (round-4 weak-4): two public bootstrap_batch calls
    with the SAME flat_key must draw DISTINCT mask streams (auto epoch);
    pinning `epoch` restores bit-reproducibility."""
    params, ctx, sk, bkey = setup64
    msg = _random_bits(41, params.n)
    ct = F.encrypt(sk, jax.random.key(42), jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    lwe1 = F.LWE(bits.lwe.a[0:8:2], bits.lwe.b[0:8:2])
    lwe2 = F.LWE(bits.lwe.a[1:8:2], bits.lwe.b[1:8:2])
    fk = jax.random.key(43)
    r1 = F.bootstrap_batch(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, True
    )
    r2 = F.bootstrap_batch(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, True
    )
    assert not (np.asarray(r1[0].a) == np.asarray(r2[0].a)).all()
    # both still decrypt to the same (correct) gate outputs
    e = msg[0:8:2] & msg[1:8:2]
    for r in (r1, r2):
        got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(r[0])))
        np.testing.assert_array_equal(got, e)
    # pinned epoch -> reproducible
    r3 = F.bootstrap_batch(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, True, epoch=3
    )
    r4 = F.bootstrap_batch(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, True, epoch=3
    )
    for l3, l4 in zip(r3, r4):
        np.testing.assert_array_equal(np.asarray(l3.a), np.asarray(l4.a))
        np.testing.assert_array_equal(np.asarray(l3.b), np.asarray(l4.b))


@pytest.mark.parametrize("randomized", [False, True], ids=["det", "rand"])
def test_pack_encrypted_bits(setup64, randomized):
    params, ctx, sk, bkey = setup64
    msg = _random_bits(18, params.n)
    ct = F.encrypt(sk, jax.random.key(19), jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    fk = jax.random.key(20) if randomized else None
    packed = F.pack_encrypted_bits(params, ctx, bkey, bits, fk)
    # direct decrypt of the m-length ciphertext
    assert (np.asarray(F.decrypt(sk, packed)) == msg).all()
    # re-split and decrypt each bit
    bits2 = F.split_ciphertext(packed)
    assert (np.asarray(F.decrypt_bit(sk, bits2)) == msg).all()


def test_prewarm_runs_production_dispatch():
    """prewarm must drive the real bootstrap_batch dispatch (zero-valued
    stand-ins) and report stage timings for each requested mode."""
    import sgfhe_tpu as F

    params = F.Params.create(64)
    t = F.prewarm(params, batch=8, modes=("deterministic",), verbose=False)
    assert set(t) == {"context", "deterministic"}
    assert all(v >= 0 for v in t.values())
