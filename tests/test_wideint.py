"""Encrypted wide-integer arithmetic (models/wideint.py) over scheme-2
digits — composition of the functional bootstrap into multi-digit adds and
schoolbook multiplies, all at toy n=64 (hardware runs: examples/scheme2_add.py
and RESULTS.md)."""

import numpy as np
import pytest
import jax

from sgfhe_tpu.models import scheme2 as s2
from sgfhe_tpu.models import wideint as wi


@pytest.fixture(scope="module")
def toy_k1():
    params = s2.Params.create(1, n=64)
    ctx = s2.make_context(params)
    sk = s2.PrivateKey.create(params, jax.random.key(1))
    bkey = s2.BootstrapKey.create(ctx, sk, jax.random.key(2))
    return params, ctx, sk, bkey


def test_encrypt_decrypt_wide(toy_k1):
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 4, 12
    rng = np.random.default_rng(5)
    vals = rng.integers(0, 2 ** (k * W), B)
    digits = wi.encrypt_wide(sk, jax.random.key(6), vals, W)
    np.testing.assert_array_equal(wi.decrypt_wide(sk, digits), vals)


def test_add_wide(toy_k1):
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 3, 8
    rng = np.random.default_rng(8)
    xs_v = rng.integers(0, 2 ** (k * W), B)
    ys_v = rng.integers(0, 2 ** (k * W), B)
    xs = wi.encrypt_wide(sk, jax.random.key(9), xs_v, W)
    ys = wi.encrypt_wide(sk, jax.random.key(10), ys_v, W)
    out = wi.add_wide(params, ctx, bkey, xs, ys)
    assert len(out) == W + 1
    np.testing.assert_array_equal(wi.decrypt_wide(sk, out), xs_v + ys_v)


def test_mul_wide_and_chain(toy_k1):
    """2-digit schoolbook product (one batched digit-mul round + column
    reduction), then CHAIN: feed the product into a further add_wide — the
    outputs must still decrypt exactly (every digit is refreshed)."""
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 2, 8
    rng = np.random.default_rng(12)
    xs_v = rng.integers(0, 2 ** (k * W), B)
    ys_v = rng.integers(0, 2 ** (k * W), B)
    xs = wi.encrypt_wide(sk, jax.random.key(13), xs_v, W)
    ys = wi.encrypt_wide(sk, jax.random.key(14), ys_v, W)
    prod = wi.mul_wide(params, ctx, bkey, xs, ys)
    assert len(prod) == 2 * W
    np.testing.assert_array_equal(wi.decrypt_wide(sk, prod), xs_v * ys_v)

    zs_v = rng.integers(0, 2 ** (k * 2 * W), B)
    zs = wi.encrypt_wide(sk, jax.random.key(15), zs_v, 2 * W)
    total = wi.add_wide(params, ctx, bkey, prod, zs)
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, total), xs_v * ys_v + zs_v
    )


def test_mul_wide_randomized(toy_k1):
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 2, 4
    rng = np.random.default_rng(16)
    xs_v = rng.integers(0, 2 ** (k * W), B)
    ys_v = rng.integers(0, 2 ** (k * W), B)
    xs = wi.encrypt_wide(sk, jax.random.key(17), xs_v, W)
    ys = wi.encrypt_wide(sk, jax.random.key(18), ys_v, W)
    prod = wi.mul_wide(params, ctx, bkey, xs, ys, flat_key=jax.random.key(19))
    np.testing.assert_array_equal(wi.decrypt_wide(sk, prod), xs_v * ys_v)


def test_sub_wide_and_compare(toy_k1):
    """Two's-complement subtraction: diff digits, the [x >= y] carry flag,
    linear NOT, and the eq_wide AND-composition all decrypt exactly."""
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 3, 10
    rng = np.random.default_rng(21)
    xs_v = rng.integers(0, 2 ** (k * W), B)
    ys_v = rng.integers(0, 2 ** (k * W), B)
    # force a few ties and an x < y / x > y on known lanes
    ys_v[0] = xs_v[0]
    xs_v[1], ys_v[1] = 0, 2 ** (k * W) - 1
    xs_v[2], ys_v[2] = 2 ** (k * W) - 1, 0
    xs = wi.encrypt_wide(sk, jax.random.key(22), xs_v, W)
    ys = wi.encrypt_wide(sk, jax.random.key(23), ys_v, W)

    diff, ge = wi.sub_wide(params, ctx, bkey, xs, ys)
    from sgfhe_tpu.models import bootstrap2 as bs2

    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, diff), (xs_v - ys_v) % 2 ** (k * W)
    )
    ge_v = np.asarray(bs2.decrypt_lwe(sk, ge))
    np.testing.assert_array_equal(ge_v, (xs_v >= ys_v).astype(int))
    lt_v = np.asarray(bs2.decrypt_lwe(sk, wi.flag_not(params, ge)))
    np.testing.assert_array_equal(lt_v, (xs_v < ys_v).astype(int))

    eq = wi.eq_wide(params, ctx, bkey, xs, ys)
    np.testing.assert_array_equal(
        np.asarray(bs2.decrypt_lwe(sk, eq)), (xs_v == ys_v).astype(int)
    )


def test_select_and_min_max(toy_k1):
    """Encrypted cmov: select_wide against a ge_wide flag, min_max_wide,
    and chainability (feed max into a further add_wide)."""
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 3, 8
    rng = np.random.default_rng(41)
    xs_v = rng.integers(0, 2 ** (k * W), B)
    ys_v = rng.integers(0, 2 ** (k * W), B)
    ys_v[0] = xs_v[0]  # tie lane: ge=1 -> select x
    xs = wi.encrypt_wide(sk, jax.random.key(42), xs_v, W)
    ys = wi.encrypt_wide(sk, jax.random.key(43), ys_v, W)

    ge = wi.ge_wide(params, ctx, bkey, xs, ys)
    sel = wi.select_wide(params, ctx, bkey, ge, xs, ys)
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, sel), np.where(xs_v >= ys_v, xs_v, ys_v)
    )

    mins, maxs = wi.min_max_wide(params, ctx, bkey, xs, ys)
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, mins), np.minimum(xs_v, ys_v)
    )
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, maxs), np.maximum(xs_v, ys_v)
    )

    total = wi.add_wide(params, ctx, bkey, mins, maxs)
    np.testing.assert_array_equal(wi.decrypt_wide(sk, total), xs_v + ys_v)


def test_select_randomized(toy_k1):
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 2, 6
    rng = np.random.default_rng(51)
    xs_v = rng.integers(0, 2 ** (k * W), B)
    ys_v = rng.integers(0, 2 ** (k * W), B)
    xs = wi.encrypt_wide(sk, jax.random.key(52), xs_v, W)
    ys = wi.encrypt_wide(sk, jax.random.key(53), ys_v, W)
    mins, maxs = wi.min_max_wide(
        params, ctx, bkey, xs, ys, flat_key=jax.random.key(54)
    )
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, mins), np.minimum(xs_v, ys_v)
    )
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, maxs), np.maximum(xs_v, ys_v)
    )


def test_oddeven_network_plain():
    """The comparator network sorts every permutation (plaintext check)."""
    import itertools

    for N in (2, 4, 8):
        pairs = wi._oddeven_pairs(N)
        base = list(range(N)) if N <= 4 else None
        perms = (
            itertools.permutations(base)
            if base is not None
            else [np.random.default_rng(s).permutation(N) for s in range(20)]
        )
        for perm in perms:
            v = list(perm)
            for i, j in pairs:
                if v[i] > v[j]:
                    v[i], v[j] = v[j], v[i]
            assert v == sorted(v), (N, perm)


def test_sort_wide(toy_k1):
    """Oblivious sort of 4 encrypted 2-digit numbers via the Batcher
    network of min_max_wide compare-exchanges, batched over B lanes."""
    params, ctx, sk, bkey = toy_k1
    k, W, B, N = params.k, 2, 4, 4
    rng = np.random.default_rng(61)
    vals = rng.integers(0, 2 ** (k * W), (N, B))
    vals[:, 0] = [3, 3, 0, 3]  # duplicate-heavy lane
    items = [
        wi.encrypt_wide(sk, jax.random.key(100 + i), vals[i], W)
        for i in range(N)
    ]
    out = wi.sort_wide(params, ctx, bkey, items)
    got = np.stack([wi.decrypt_wide(sk, d) for d in out])
    np.testing.assert_array_equal(got, np.sort(vals, axis=0))


def test_sub_wide_randomized(toy_k1):
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 2, 6
    rng = np.random.default_rng(31)
    xs_v = rng.integers(0, 2 ** (k * W), B)
    ys_v = rng.integers(0, 2 ** (k * W), B)
    xs = wi.encrypt_wide(sk, jax.random.key(32), xs_v, W)
    ys = wi.encrypt_wide(sk, jax.random.key(33), ys_v, W)
    diff, ge = wi.sub_wide(
        params, ctx, bkey, xs, ys, flat_key=jax.random.key(34)
    )
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, diff), (xs_v - ys_v) % 2 ** (k * W)
    )


def test_wideint_pruned(toy_k1):
    """Digit pruning through the whole wideint stack: add, mul, sub/compare
    and min_max all correct at prune=1 (approximate gadget; toy set has
    L=2 so one digit row is kept)."""
    params, ctx, sk, bkey = toy_k1
    k, W, B = params.k, 2, 6
    rng = np.random.default_rng(71)
    xs_v = rng.integers(0, 2 ** (k * W), B)
    ys_v = rng.integers(0, 2 ** (k * W), B)
    xs = wi.encrypt_wide(sk, jax.random.key(72), xs_v, W)
    ys = wi.encrypt_wide(sk, jax.random.key(73), ys_v, W)
    out = wi.add_wide(params, ctx, bkey, xs, ys, prune=1)
    np.testing.assert_array_equal(wi.decrypt_wide(sk, out), xs_v + ys_v)
    prod = wi.mul_wide(params, ctx, bkey, xs, ys, prune=1)
    np.testing.assert_array_equal(wi.decrypt_wide(sk, prod), xs_v * ys_v)
    diff, ge = wi.sub_wide(params, ctx, bkey, xs, ys, prune=1)
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, diff), (xs_v - ys_v) % 2 ** (k * W)
    )
    from sgfhe_tpu.models import bootstrap2 as bs2

    np.testing.assert_array_equal(
        np.asarray(bs2.decrypt_lwe(sk, ge)), (xs_v >= ys_v).astype(int)
    )
    mins, maxs = wi.min_max_wide(params, ctx, bkey, xs, ys, prune=1)
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, mins), np.minimum(xs_v, ys_v)
    )
    np.testing.assert_array_equal(
        wi.decrypt_wide(sk, maxs), np.maximum(xs_v, ys_v)
    )
