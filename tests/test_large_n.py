"""Large-n coverage (the reference's UInt128 regime, src/fhe.jl:71-81;
perf tests run Params(1024), test/performance.test.jl:54-78): parameter
derivation and the full private+public encrypt/decrypt roundtrip at
n = 1024 and n = 2048, plus the rescale_wide-backed public path at n = 4096
(q ~ 2^29, past mm.rescale's fixup bound)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F


@pytest.mark.slow
@pytest.mark.parametrize("n", [1024, 2048])
def test_roundtrips_large_n(n):
    params = F.Params.create(n)
    assert params.q.bit_length() <= 30
    ctx = F.make_context(params)
    key = jax.random.key(n)
    k_sk, k_pk, k_msg, k_enc = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    msg = jax.random.bernoulli(k_msg, 0.5, (params.n,))
    ct = F.encrypt(sk, k_enc, msg)
    assert (np.asarray(F.decrypt(sk, ct)) == np.asarray(msg)).all()
    pk = F.PublicKey.create(ctx, sk, k_pk)
    ct2 = F.encrypt_public(pk, ctx, k_enc, msg)
    assert (np.asarray(F.decrypt(sk, ct2)) == np.asarray(msg)).all()
    bits = F.split_ciphertext(ct)
    assert (np.asarray(F.decrypt_bit(sk, bits)) == np.asarray(msg)).all()


@pytest.mark.slow
def test_public_roundtrip_n4096_wide_rescale():
    params = F.Params.create(4096)
    assert params.q.bit_length() >= 29  # must exercise rescale_wide
    ctx = F.make_context(params)
    key = jax.random.key(4096)
    k_sk, k_pk, k_msg, k_enc = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    pk = F.PublicKey.create(ctx, sk, k_pk)
    msg = jax.random.bernoulli(k_msg, 0.5, (params.n,))
    ct = F.encrypt_public(pk, ctx, k_enc, msg)
    assert (np.asarray(F.decrypt(sk, ct)) == np.asarray(msg)).all()


@pytest.mark.slow
def test_roundtrip_n8192_rns_q():
    """n = 8192: the RNS-q regime (q = product of two NTT-friendly primes,
    params.q_moduli) — the round-3 cap `assert q < 2^30` is gone. Private
    and PUBLIC roundtrips plus split, with the exact CRT rescale switching
    q -> r (reference reaches this width via `rlwe_type`,
    src/fhe.jl:71-81)."""
    params = F.Params.create(8192)
    assert len(params.q_moduli) == 2
    assert params.q.bit_length() >= 31
    for qf in params.q_moduli:
        assert (qf - 1) % (2 * params.n) == 0 and qf < (1 << 28)
    ctx = F.make_context(params)
    key = jax.random.key(8192)
    k_sk, k_pk, k_msg, k_enc = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    msg = jax.random.bernoulli(k_msg, 0.5, (params.n,))
    ct = F.encrypt(sk, k_enc, msg)
    assert (np.asarray(F.decrypt(sk, ct)) == np.asarray(msg)).all()
    pk = F.PublicKey.create(ctx, sk, k_pk)
    assert pk.k0.shape == (2, params.n)
    ct2 = F.encrypt_public(pk, ctx, k_enc, msg)
    assert (np.asarray(F.decrypt(sk, ct2)) == np.asarray(msg)).all()
    bits = F.split_ciphertext(ct)
    assert (np.asarray(F.decrypt_bit(sk, bits)) == np.asarray(msg)).all()
    # wire roundtrip of the (Lq, n) public key
    from sgfhe_tpu import serialize as ser

    pk2 = ser.from_wire(ser.to_wire(pk))
    np.testing.assert_array_equal(np.asarray(pk2.k0), np.asarray(pk.k0))
    np.testing.assert_array_equal(np.asarray(pk2.k1), np.asarray(pk.k1))
