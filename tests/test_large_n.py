"""Large-n coverage (the reference's UInt128 regime, src/fhe.jl:71-81;
perf tests run Params(1024), test/performance.test.jl:54-78): parameter
derivation and the full private+public encrypt/decrypt roundtrip at
n = 1024 and n = 2048, plus the rescale_wide-backed public path at n = 4096
(q ~ 2^29, past mm.rescale's fixup bound), the RNS-q path at n = 8192, and
the split-matmul / K=2-rescale envelope ceiling at n = 16384."""

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


@pytest.mark.slow
def test_split_matmul_oracle_n16384():
    """The split-halves negacyclic matmul (n*r >= 2^31 regime,
    ops/poly.py) against an int64 convolution oracle. A pure roundtrip
    cannot prove this: encrypt and decrypt share the matmul, so a
    consistent error would cancel."""
    from sgfhe_tpu.ops import poly as P

    n, r = 16384, 1 << 18
    rng = np.random.default_rng(1)
    a = rng.integers(0, r, n, dtype=np.uint32)
    s = rng.integers(0, 2, n, dtype=np.uint32)
    w = P.toeplitz_from_small(jnp.asarray(s))
    out = np.asarray(
        jax.jit(lambda x: P.negacyclic_matmul_mask(x, w, r - 1))(
            jnp.asarray(a)
        )
    )
    full = np.convolve(a.astype(np.int64), s.astype(np.int64))
    c = np.zeros(n, dtype=np.int64)
    c[:n] += full[:n]
    c[: n - 1] -= full[n:]
    np.testing.assert_array_equal(out, (c % r).astype(np.uint32))


@pytest.mark.slow
def test_roundtrip_n16384_envelope_ceiling():
    """n = 16384 (r = 2^18): the top of the design envelope. Exercises the
    split-halves negacyclic matmul (n*r = 2^32 > int32 accumulation) and
    the K=2 rescale_exact correction ladder (A = 2r = 2^19 outgrows the
    one-step float32 budget). The reference reaches this width via its
    UInt128 `rlwe_type` (src/fhe.jl:71-81)."""
    params = F.Params.create(16384)
    assert params.r == 1 << 18
    assert len(params.q_moduli) == 2
    key = jax.random.key(16384)
    k_sk, k_pk, k_msg, k_enc = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    msg = jax.random.bernoulli(k_msg, 0.5, (params.n,))
    ct = F.encrypt(sk, k_enc, msg)
    assert (np.asarray(F.decrypt(sk, ct)) == np.asarray(msg)).all()
    bits = F.split_ciphertext(ct)
    assert (np.asarray(F.decrypt_bit(sk, bits)) == np.asarray(msg)).all()
    ctx = F.make_context(params)
    pk = F.PublicKey.create(ctx, sk, k_pk)
    ct2 = F.encrypt_public(pk, ctx, k_enc, msg)
    assert (np.asarray(F.decrypt(sk, ct2)) == np.asarray(msg)).all()
