"""Scheme-2 tests (reference examples/test_scheme2.jl + src/fhe2.jl
capability): k-bit encrypt/decrypt roundtrips for private and public keys;
BootstrapKey construction is covered behind the slow marker (the reference
also only constructs it)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgfhe_tpu.models import scheme2 as s2


@pytest.fixture(scope="module")
def setup_k1():
    params = s2.Params.create(1)
    ctx = s2.make_context(params)
    sk = s2.PrivateKey.create(params, jax.random.key(1))
    return params, ctx, sk


def test_params_derivations():
    p = s2.Params.create(1)
    assert p.n == 1024 and p.r == 2**12 and p.m == 2**11
    assert p.q >= 2**7 * p.r * p.n
    for q in p.q_moduli:
        assert (q - 1) % (2 * p.n) == 0
    for q in p.moduli:
        assert (q - 1) % (2 * p.m) == 0
    # Q exceeds the paper's B*Bp lower bound
    import math
    bound = 15 * 2 ** (2 * 1 + 2) * p.r * p.tau * math.isqrt(2 * 2 * p.m)
    assert p.Q >= bound * bound


def test_private_roundtrip(setup_k1):
    params, ctx, sk = setup_k1
    msg = np.asarray(
        jax.random.randint(jax.random.key(2), (params.n,), 0, 2**params.k)
    )
    a, b = s2.encrypt(sk, jax.random.key(3), jnp.asarray(msg))
    dec = np.asarray(s2.decrypt(sk, a, b))
    np.testing.assert_array_equal(dec, msg)


def test_public_roundtrip(setup_k1):
    params, ctx, sk = setup_k1
    pk = s2.PublicKey.create(ctx, sk, jax.random.key(4))
    msg = np.asarray(
        jax.random.randint(jax.random.key(5), (params.n,), 0, 2**params.k)
    )
    a, b = s2.encrypt(pk, ctx, jax.random.key(6), jnp.asarray(msg))
    dec = np.asarray(s2.decrypt(sk, a, b))
    np.testing.assert_array_equal(dec, msg)


@pytest.mark.parametrize("k", [2, 5])
def test_private_roundtrip_other_k(k):
    params = s2.Params.create(k)
    sk = s2.PrivateKey.create(params, jax.random.key(10 + k))
    msg = np.asarray(
        jax.random.randint(jax.random.key(20 + k), (params.n,), 0, 2**k)
    )
    a, b = s2.encrypt(sk, jax.random.key(30 + k), jnp.asarray(msg))
    dec = np.asarray(s2.decrypt(sk, a, b))
    np.testing.assert_array_equal(dec, msg)


@pytest.mark.slow
def test_bootstrap_key_construction(setup_k1):
    params, ctx, sk = setup_k1
    bkey = s2.BootstrapKey.create(ctx, sk, jax.random.key(7))
    rows = 2 * params.num_digits
    assert bkey.hat.shape == (params.n, rows, 2, params.num_limbs, params.m)
