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


@pytest.mark.parametrize("k", [1, 2, 3, 4, 5])
def test_switch_q_to_r_matches_bigint_oracle(k):
    """The q->r modulus switch (reference src/fhe2.jl:202-207 via
    src/utils.jl:78-127) must be EXACT for both the round and floor paths of
    every parameter set, including inputs adjacent to every digit boundary."""
    from sgfhe_tpu.models.scheme2 import _switch_q_to_r

    params = s2.Params.create(k)
    ctx = s2.make_context(params)
    q = params.q
    new_max_round = params.r
    grid = 1 << (params.t - params.k - 5)
    new_max_floor = params.r // grid

    rng = np.random.default_rng(100 + k)
    xs = [int(v) for v in rng.integers(0, min(q, 2**63), 64)]
    xs = [v % q for v in xs]
    for t in rng.integers(0, new_max_round, 16):
        lo = ((2 * int(t) + 1) * q) // (2 * new_max_round)
        xs.extend([lo % q, (lo + 1) % q])
    for t in rng.integers(0, new_max_floor, 16):
        lo = (int(t) * q) // new_max_floor
        xs.extend([lo % q, (lo + 1) % q])

    Lq = len(params.q_moduli)
    res = np.stack(
        [np.array([v % p for v in xs], dtype=np.uint32) for p in params.q_moduli]
    )
    assert res.shape == (Lq, len(xs))
    got_r = np.asarray(
        _switch_q_to_r(params, ctx, jnp.asarray(res), new_max_round, True)
    )
    got_f = np.asarray(
        _switch_q_to_r(params, ctx, jnp.asarray(res), new_max_floor, False)
    )
    for gr, gf, v in zip(got_r, got_f, xs):
        assert int(gr) == (v * new_max_round + q // 2) // q % new_max_round
        assert int(gf) == (v * new_max_floor) // q % new_max_floor


def test_decrypt_matches_bigint_oracle(setup_k1):
    """k-bit decrypt snapping (reference src/fhe2.jl:213-236) against a pure
    big-int model, with b values sitting exactly on digit boundaries."""
    params, ctx, sk = setup_k1
    n, r, Dr, k = params.n, params.r, params.Dr, params.k
    s_bits = np.asarray(sk.key).astype(np.int64)

    rng = np.random.default_rng(7)
    a = rng.integers(0, r, (n,)).astype(np.uint32)
    # choose b so that (b - s*a) mod r lands on/next to every snap boundary
    sa = np.zeros(n, dtype=np.int64)
    idx = (np.arange(n)[:, None] - np.arange(n)[None, :]) % n
    sign = np.where(np.arange(n)[None, :] > np.arange(n)[:, None], -1, 1)
    for i in range(n):
        sa[i] = int((a[idx[i]] * sign[i] * s_bits).sum()) % r
    targets = []
    for digit in range(2**k):
        base = digit * Dr
        targets.extend([base, (base + Dr // 2 - 1) % r, (base + Dr // 2) % r])
    targets = np.array((targets * ((n // len(targets)) + 1))[:n], dtype=np.int64)
    b = ((sa + targets) % r).astype(np.uint32)

    got = np.asarray(s2.decrypt(sk, jnp.asarray(a), jnp.asarray(b)))
    expected = ((targets + Dr // 2) % r) // Dr
    np.testing.assert_array_equal(got, expected)
