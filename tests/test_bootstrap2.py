"""Scheme-2 functional bootstrap (models/bootstrap2.py) — capability BEYOND
the reference (src/fhe2.jl:6 leaves bootstrapping unimplemented upstream).

Runs at a toy n=64 parameter set (the paper's n=1024 derivations scale down
exactly as long as n stays a power of four; the real size is exercised on
hardware by examples/scheme2_add.py). Checks: add-with-carry truth tables,
ripple-carry chaining through refreshed digits, arbitrary LUTs, noise reset,
randomized flattening, and fused-kernel (interpret-mode) bit-equality with
the jnp path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sgfhe_tpu.models import scheme2 as s2
from sgfhe_tpu.models import bootstrap2 as bs2


@pytest.fixture(scope="module")
def toy_k1():
    params = s2.Params.create(1, n=64)
    ctx = s2.make_context(params)
    sk = s2.PrivateKey.create(params, jax.random.key(1))
    bkey = s2.BootstrapKey.create(ctx, sk, jax.random.key(2))
    return params, ctx, sk, bkey


@pytest.fixture(scope="module")
def toy_k2():
    params = s2.Params.create(2, n=64)
    ctx = s2.make_context(params)
    sk = s2.PrivateKey.create(params, jax.random.key(3))
    bkey = s2.BootstrapKey.create(ctx, sk, jax.random.key(4))
    return params, ctx, sk, bkey


def _enc_lwes(params, sk, msg, seed):
    a, b = s2.encrypt(sk, jax.random.key(seed), jnp.asarray(msg))
    return bs2.split_ciphertext(params, a, b)


def _take(lwe, idx):
    from sgfhe_tpu.models.scheme1 import LWE

    return LWE(lwe.a[idx], lwe.b[idx])


def test_toy_params_derivations():
    p = s2.Params.create(1, n=64)
    assert p.n == 64 and p.r == 2**10 and p.m == 2**9 and p.Dr == 128
    for q in p.moduli:
        assert (q - 1) % (2 * p.m) == 0
    # toy roundtrip still exact
    sk = s2.PrivateKey.create(p, jax.random.key(11))
    msg = np.asarray(jax.random.randint(jax.random.key(12), (p.n,), 0, 2))
    a, b = s2.encrypt(sk, jax.random.key(13), jnp.asarray(msg))
    np.testing.assert_array_equal(np.asarray(s2.decrypt(sk, a, b)), msg)


@pytest.mark.parametrize("fixture", ["toy_k1", "toy_k2"])
def test_add_with_carry(fixture, request):
    params, ctx, sk, bkey = request.getfixturevalue(fixture)
    k = params.k
    rng = np.random.default_rng(40 + k)
    x = rng.integers(0, 2**k, params.n)
    y = rng.integers(0, 2**k, params.n)
    lx = _enc_lwes(params, sk, x, 50 + k)
    ly = _enc_lwes(params, sk, y, 60 + k)
    B = 16
    digit, carry = bs2.add_with_carry(
        params, ctx, bkey, _take(lx, slice(0, B)), _take(ly, slice(0, B))
    )
    got_d = np.asarray(bs2.decrypt_lwe(sk, digit))
    got_c = np.asarray(bs2.decrypt_lwe(sk, carry))
    z = x[:B] + y[:B]
    np.testing.assert_array_equal(got_d, z % 2**k)
    np.testing.assert_array_equal(got_c, z // 2**k)
    # outputs are REFRESHED: phase noise far inside the decision boundary
    nd = np.asarray(bs2.lwe_phase_noise(sk, digit, jnp.asarray(z % 2**k)))
    nc = np.asarray(bs2.lwe_phase_noise(sk, carry, jnp.asarray(z // 2**k)))
    bound = params.Dr // 4
    assert np.abs(nd).max() < bound and np.abs(nc).max() < bound


def test_ripple_carry_chain(toy_k1):
    """Multi-digit addition: ripple the bootstrap carry through 4 digit
    positions (the paper's k-bit arithmetic composed into wide adders).
    Fresh inputs are refreshed first so every operand entering a sum is a
    low-noise bootstrap output."""
    params, ctx, sk, bkey = toy_k1
    k = params.k
    W = 4  # digits per number
    rng = np.random.default_rng(77)
    B = 8  # independent additions
    xs = rng.integers(0, 2 ** (k * W), B)
    ys = rng.integers(0, 2 ** (k * W), B)
    xd = np.stack([(xs >> (k * i)) & (2**k - 1) for i in range(W)])  # (W, B)
    yd = np.stack([(ys >> (k * i)) & (2**k - 1) for i in range(W)])

    def enc_col(col, seed):
        msg = np.zeros(params.n, dtype=np.int64)
        msg[: col.shape[0]] = col
        return _take(_enc_lwes(params, sk, msg, seed), slice(0, B))

    lx = [bs2.refresh(params, ctx, bkey, enc_col(xd[i], 100 + i)) for i in range(W)]
    ly = [bs2.refresh(params, ctx, bkey, enc_col(yd[i], 200 + i)) for i in range(W)]

    carry = None
    out_digits = []
    for i in range(W):
        d, carry = bs2.add_with_carry(params, ctx, bkey, lx[i], ly[i], carry)
        out_digits.append(np.asarray(bs2.decrypt_lwe(sk, d)))
    cout = np.asarray(bs2.decrypt_lwe(sk, carry))

    got = np.zeros(B, dtype=np.int64)
    for i, dig in enumerate(out_digits):
        got += dig.astype(np.int64) << (k * i)
    got += cout.astype(np.int64) << (k * W)
    np.testing.assert_array_equal(got, xs + ys)


def test_apply_lut_and_refresh(toy_k2):
    params, ctx, sk, bkey = toy_k2
    k = params.k
    rng = np.random.default_rng(9)
    x = rng.integers(0, 2**k, params.n)
    lx = _take(_enc_lwes(params, sk, x, 70), slice(0, 16))
    lut = [3, 1, 0, 2]
    out = bs2.apply_lut(params, ctx, bkey, lx, lut)
    exp = np.array(lut)[x[:16]]
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, out)), exp)

    ref = bs2.refresh(params, ctx, bkey, lx)
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, ref)), x[:16])
    noise = np.asarray(bs2.lwe_phase_noise(sk, ref, jnp.asarray(x[:16])))
    assert np.abs(noise).max() < params.Dr // 4


def test_randomized_flattening(toy_k1):
    params, ctx, sk, bkey = toy_k1
    k = params.k
    rng = np.random.default_rng(31)
    x = rng.integers(0, 2**k, params.n)
    y = rng.integers(0, 2**k, params.n)
    lx = _take(_enc_lwes(params, sk, x, 80), slice(0, 8))
    ly = _take(_enc_lwes(params, sk, y, 81), slice(0, 8))
    fk = jax.random.key(82)
    digit, carry = bs2.add_with_carry(params, ctx, bkey, lx, ly, flat_key=fk)
    z = x[:8] + y[:8]
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, digit)), z % 2**k)
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, carry)), z // 2**k)
    # same key, no pinned epoch -> a FRESH mask stream per public call
    # (ops/prg.fold_epoch, the round-4 replay-hazard fix): outputs differ
    d2, _ = bs2.add_with_carry(params, ctx, bkey, lx, ly, flat_key=fk)
    assert not (np.asarray(digit.a) == np.asarray(d2.a)).all()
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, d2)), z % 2**k)
    # reproducible when the epoch is pinned; still differs from deterministic
    d3, _ = bs2.add_with_carry(params, ctx, bkey, lx, ly, flat_key=fk, epoch=7)
    d4, _ = bs2.add_with_carry(params, ctx, bkey, lx, ly, flat_key=fk, epoch=7)
    np.testing.assert_array_equal(np.asarray(d3.a), np.asarray(d4.a))
    d_det, _ = bs2.add_with_carry(params, ctx, bkey, lx, ly)
    assert not (np.asarray(d3.a) == np.asarray(d_det.a)).all()


def test_pruned_add_with_carry(toy_k1):
    """Approximate-gadget digit pruning on the scheme-2 functional bootstrap
    (shared blind-rotation core): prune=1 must decrypt correctly with noise
    inside the budget, and the analytic bound must be microscopic."""
    from sgfhe_tpu.models.params import prune_error_bound

    params, ctx, sk, bkey = toy_k1
    k = params.k
    assert prune_error_bound(params, 1) < 0.01
    rng = np.random.default_rng(57)
    x = rng.integers(0, 2**k, params.n)
    y = rng.integers(0, 2**k, params.n)
    lx = _take(_enc_lwes(params, sk, x, 90), slice(0, 16))
    ly = _take(_enc_lwes(params, sk, y, 91), slice(0, 16))
    digit, carry = bs2.add_with_carry(params, ctx, bkey, lx, ly, prune=1)
    z = x[:16] + y[:16]
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, digit)), z % 2**k)
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, carry)), z // 2**k)
    noise = np.asarray(bs2.lwe_phase_noise(sk, digit, jnp.asarray(z % 2**k)))
    assert np.abs(noise).max() < params.Dr // 4


@pytest.mark.parametrize("fixture", ["toy_k1", "toy_k2"])
def test_mul_exhaustive(fixture, request):
    """k-bit digit multiplication via quarter-squares: every (x, y) pair in
    [0, 2^k)^2 in one batch; low and high product digits must both be exact
    and refreshed."""
    params, ctx, sk, bkey = request.getfixturevalue(fixture)
    k = params.k
    K = 2**k
    pairs = [(x, y) for x in range(K) for y in range(K)]
    xs = np.array([p[0] for p in pairs])
    ys = np.array([p[1] for p in pairs])

    def enc(col, seed):
        msg = np.zeros(params.n, dtype=np.int64)
        msg[: col.shape[0]] = col
        return _take(_enc_lwes(params, sk, msg, seed), slice(0, len(pairs)))

    lx = enc(xs, 300 + k)
    ly = enc(ys, 301 + k)
    lo, hi = bs2.mul(params, ctx, bkey, lx, ly)
    got_lo = np.asarray(bs2.decrypt_lwe(sk, lo))
    got_hi = np.asarray(bs2.decrypt_lwe(sk, hi))
    prod = xs * ys
    np.testing.assert_array_equal(got_lo, prod % K)
    np.testing.assert_array_equal(got_hi, prod // K)
    nlo = np.asarray(bs2.lwe_phase_noise(sk, lo, jnp.asarray(prod % K)))
    nhi = np.asarray(bs2.lwe_phase_noise(sk, hi, jnp.asarray(prod // K)))
    assert max(np.abs(nlo).max(), np.abs(nhi).max()) < params.Dr // 4


def test_mul_randomized(toy_k1):
    params, ctx, sk, bkey = toy_k1
    K = 2**params.k
    pairs = [(x, y) for x in range(K) for y in range(K)]
    xs = np.array([p[0] for p in pairs])
    ys = np.array([p[1] for p in pairs])
    msgx = np.zeros(params.n, dtype=np.int64)
    msgx[: len(pairs)] = xs
    msgy = np.zeros(params.n, dtype=np.int64)
    msgy[: len(pairs)] = ys
    lx = _take(_enc_lwes(params, sk, msgx, 310), slice(0, len(pairs)))
    ly = _take(_enc_lwes(params, sk, msgy, 311), slice(0, len(pairs)))
    lo, hi = bs2.mul(params, ctx, bkey, lx, ly, flat_key=jax.random.key(312))
    prod = xs * ys
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, lo)), prod % K)
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, hi)), prod // K)


def test_fused_interpret_matches_jnp(toy_k1):
    """The scheme-2 path through the shared Pallas kernels must be
    bit-identical to the jnp path (same invariant as scheme 1,
    tests/test_fused.py)."""
    params, ctx, sk, bkey = toy_k1
    k = params.k
    rng = np.random.default_rng(55)
    x = rng.integers(0, 2**k, params.n)
    y = rng.integers(0, 2**k, params.n)
    lx = _take(_enc_lwes(params, sk, x, 90), slice(0, 8))
    ly = _take(_enc_lwes(params, sk, y, 91), slice(0, 8))
    u = bs2._lwe_sum(params, lx, ly)
    zmax = 2 ** (k + 1)
    th = bs2.tables_hat(
        params, ctx,
        [[z % 2**k for z in range(zmax)], [z // 2**k for z in range(zmax)]],
    )
    ref = bs2._bootstrap_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, u, th, False, ("none", False)
    )
    for kernel in ("resident", "streamed"):
        got = bs2._bootstrap_jit(
            params, ctx, bkey.hat, bkey.hat_shoup, u, th, False, (kernel, True)
        )
        np.testing.assert_array_equal(np.asarray(ref.a), np.asarray(got.a))
        np.testing.assert_array_equal(np.asarray(ref.b), np.asarray(got.b))
