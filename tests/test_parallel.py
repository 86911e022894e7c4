"""Multi-device tests on the 8-virtual-CPU-device mesh (conftest.py): sharded
execution must reproduce single-device results bit-for-bit (the deterministic
path makes exact comparison possible)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.parallel import mesh as mesh_mod
from sgfhe_tpu.parallel import sharded
from sgfhe_tpu.parallel import ntt_dist
from sgfhe_tpu.ops import ntt as ntt_mod
from sgfhe_tpu.utils import primes as pr


@pytest.fixture(scope="module")
def setup64():
    params = F.Params.create(64)
    ctx = F.make_context(params)
    key = jax.random.key(55)
    k_sk, k_bk = jax.random.split(key)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)
    return params, ctx, sk, bkey


def test_sharded_bootstrap_matches_single(setup64):
    params, ctx, sk, bkey = setup64
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    mesh = mesh_mod.make_mesh(dp=2, tp=2)

    msg = np.asarray(jax.random.bernoulli(jax.random.key(56), 0.5, (params.n,)))
    ct = F.encrypt(sk, jax.random.key(57), jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    # 8 gates (divisible by dp=2) keep the CPU runtime small; correctness is
    # per-gate so the count doesn't matter
    lwe1 = F.LWE(bits.lwe.a[0:16:2], bits.lwe.b[0:16:2])
    lwe2 = F.LWE(bits.lwe.a[1:16:2], bits.lwe.b[1:16:2])

    single = F.bootstrap_batch(params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2)
    multi = sharded.bootstrap_batch_sharded(params, ctx, bkey, lwe1, lwe2, mesh)
    for s, m_ in zip(single, multi):
        np.testing.assert_array_equal(np.asarray(s.a), np.asarray(m_.a))
        np.testing.assert_array_equal(np.asarray(s.b), np.asarray(m_.b))

    # a batch NOT divisible by the device count must pad + trim transparently
    odd1 = F.LWE(lwe1.a[:5], lwe1.b[:5])
    odd2 = F.LWE(lwe2.a[:5], lwe2.b[:5])
    multi_odd = sharded.bootstrap_batch_sharded(
        params, ctx, bkey, odd1, odd2, mesh
    )
    for s, m_ in zip(single, multi_odd):
        assert m_.a.shape[0] == 5
        np.testing.assert_array_equal(np.asarray(s.a)[:5], np.asarray(m_.a))
        np.testing.assert_array_equal(np.asarray(s.b)[:5], np.asarray(m_.b))


@pytest.mark.slow  # ~5 min on CPU: two full n=64 packs (compile + run)
def test_sharded_pack_matches_single(setup64):
    params, ctx, sk, bkey = setup64
    mesh = mesh_mod.make_mesh(dp=2, tp=2)
    msg = np.asarray(jax.random.bernoulli(jax.random.key(58), 0.5, (params.n,)))
    ct = F.encrypt(sk, jax.random.key(59), jnp.asarray(msg))
    bits = F.split_ciphertext(ct)

    single = F.pack_encrypted_bits(params, ctx, bkey, bits)
    multi = sharded.pack_encrypted_bits_sharded(params, ctx, bkey, bits.lwe, mesh)
    np.testing.assert_array_equal(
        np.asarray(single.rlwe.a), np.asarray(multi.rlwe.a)
    )
    np.testing.assert_array_equal(
        np.asarray(single.rlwe.b), np.asarray(multi.rlwe.b)
    )
    assert (np.asarray(F.decrypt(sk, multi)) == msg).all()


@pytest.mark.slow  # shard_map compile on the 8-device CPU mesh dominates
def test_dist_ntt_polymul_matches_local():
    """Four-step distributed negacyclic polymul == single-device NTT polymul."""
    m1, m2 = 16, 32
    m = m1 * m2
    mods = []
    start = 1 << 20
    while len(mods) < 2:
        q = pr.find_modulus(2 * m, start)
        mods.append(q)
        start = q + 1
    moduli = tuple(mods)
    mesh = mesh_mod.make_mesh(dp=2, tp=2)

    local_plan = ntt_mod.build_plan(moduli, m)
    dist_plan = ntt_dist.build_dist_plan(moduli, m1, m2)

    rng = np.random.default_rng(0)
    a = np.stack([rng.integers(0, p, size=m, dtype=np.uint32) for p in moduli])
    b = np.stack([rng.integers(0, p, size=m, dtype=np.uint32) for p in moduli])
    expect = np.asarray(ntt_mod.polymul(local_plan, jnp.asarray(a), jnp.asarray(b)))

    run = ntt_dist.make_dist_polymul(dist_plan, mesh, axis="tp")
    a3 = jnp.asarray(a.reshape(len(moduli), m1, m2))
    b3 = jnp.asarray(b.reshape(len(moduli), m1, m2))
    got = np.asarray(run(a3, b3)).reshape(len(moduli), m)
    np.testing.assert_array_equal(got, expect)


def test_scheme2_sharded_batch_roundtrip():
    """BASELINE config 5: scheme-2 encrypt/decrypt batch sharded over the
    mesh matches plaintext (and the unsharded path bit-for-bit)."""
    from sgfhe_tpu.models import scheme2 as s2

    params2 = s2.Params.create(1)
    sk2 = s2.PrivateKey.create(params2, jax.random.key(60))
    mesh = mesh_mod.make_mesh(dp=2, tp=2)
    B = 8
    keys = jax.random.split(jax.random.key(61), B)
    msgs = jax.random.randint(
        jax.random.key(62), (B, params2.n), 0, 2**params2.k, dtype=jnp.int32
    ).astype(jnp.uint32)

    a, b = sharded.scheme2_encrypt_batch_sharded(sk2, keys, msgs, mesh)
    dec = sharded.scheme2_decrypt_batch_sharded(sk2, a, b, mesh)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(msgs))

    # bit-exact vs the unsharded path (same keys)
    a0, b0 = s2._encrypt_private(sk2, keys[0], msgs[0])
    np.testing.assert_array_equal(np.asarray(a)[0], np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(b)[0], np.asarray(b0))
