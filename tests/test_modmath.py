"""Exhaustive small-domain tests for the uint32 modular core, mirroring the
reference's internals tests (test/internals.test.jl:6-47 rescale-vs-oracle)."""

import numpy as np
import jax.numpy as jnp

from sgfhe_tpu.ops import modmath as mm


def test_mulhilo_random():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 1 << 32, size=4096, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, size=4096, dtype=np.uint32)
    hi, lo = mm.mulhilo(jnp.asarray(a), jnp.asarray(b))
    prod = a.astype(np.uint64) * b.astype(np.uint64)
    np.testing.assert_array_equal(np.asarray(hi), (prod >> 32).astype(np.uint32))
    np.testing.assert_array_equal(np.asarray(lo), (prod & 0xFFFFFFFF).astype(np.uint32))


def test_addsub_neg_mod():
    p = 741507073  # < 2^30
    rng = np.random.default_rng(1)
    a = rng.integers(0, p, size=2048, dtype=np.uint32)
    b = rng.integers(0, p, size=2048, dtype=np.uint32)
    ja, jb, jp = jnp.asarray(a), jnp.asarray(b), jnp.uint32(p)
    np.testing.assert_array_equal(
        np.asarray(mm.addmod(ja, jb, jp)),
        ((a.astype(np.uint64) + b) % p).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(mm.submod(ja, jb, jp)),
        ((a.astype(np.int64) - b) % p).astype(np.uint32),
    )
    np.testing.assert_array_equal(
        np.asarray(mm.negmod(ja, jp)), ((-a.astype(np.int64)) % p).astype(np.uint32)
    )


def test_mod_u32_full_range():
    for p in (3, 65537, 12289, 741507073, (1 << 30) - 35):
        mu = jnp.uint32(mm.barrett_mu(p))
        rng = np.random.default_rng(p)
        x = rng.integers(0, 1 << 32, size=8192, dtype=np.uint32)
        # include adversarial values
        x[:4] = [0, 0xFFFFFFFF, p % (1 << 32), (p - 1) % (1 << 32)]
        got = np.asarray(mm.mod_u32(jnp.asarray(x), jnp.uint32(p), mu))
        np.testing.assert_array_equal(got, (x.astype(np.uint64) % p).astype(np.uint32))


def test_shoup_mul_any_a():
    p = 741507073
    rng = np.random.default_rng(2)
    a = rng.integers(0, 1 << 32, size=8192, dtype=np.uint32)  # full uint32 range
    w = rng.integers(0, p, size=8192, dtype=np.uint32)
    ws = ((w.astype(np.uint64) << 32) // p).astype(np.uint32)
    got = np.asarray(
        mm.shoup_mul(jnp.asarray(a), jnp.asarray(w), jnp.asarray(ws), jnp.uint32(p))
    )
    expect = (a.astype(np.uint64) * w % p).astype(np.uint32)
    np.testing.assert_array_equal(got, expect)


def test_mulmod_generic():
    for p in (65537, 12289, 998244353):
        mu = jnp.uint32(mm.barrett_mu(p))
        r_mod_p = (1 << 32) % p
        r_shoup = jnp.uint32(mm.shoup_const(r_mod_p, p))
        rng = np.random.default_rng(p)
        a = rng.integers(0, 1 << 32, size=4096, dtype=np.uint32)
        b = rng.integers(0, 1 << 32, size=4096, dtype=np.uint32)
        got = np.asarray(
            mm.mulmod(
                jnp.asarray(a), jnp.asarray(b), jnp.uint32(p), mu,
                jnp.uint32(r_mod_p), r_shoup,
            )
        )
        expect = (a.astype(np.uint64) * b % p).astype(np.uint32)
        np.testing.assert_array_equal(got, expect)


def test_rescale_exhaustive_vs_oracle():
    """Port of test/internals.test.jl:6-47: all inputs x < old_max for a 2^12-ish
    modulus, floor and round, even and odd new_max."""
    old_max = 4097
    x = np.arange(old_max, dtype=np.uint32)
    for new_max in (64, 63, 256):
        for round_result in (False, True):
            got = np.asarray(
                mm.rescale(new_max, jnp.asarray(x), old_max, round_result)
            )
            exact = x.astype(object) * new_max
            if round_result:
                # reference: q = floor(v / old_max); r = v mod old_max;
                # if r >= old_max//2 + isodd(old_max): q += 1; q == new_max -> 0
                expect = []
                for v in exact:
                    q, r = divmod(int(v), old_max)
                    if r >= old_max // 2 + (old_max % 2):
                        q += 1
                        if q == new_max:
                            q = 0
                    expect.append(q)
                expect = np.array(expect, dtype=np.uint32)
            else:
                expect = np.array([int(v) // old_max for v in exact], dtype=np.uint32)
            np.testing.assert_array_equal(got, expect, err_msg=f"{new_max} {round_result}")


def test_divmod_hilo():
    rng = np.random.default_rng(3)
    for d in (4097, 65537, 1 << 20, (1 << 28) - 1):
        x = rng.integers(0, d, size=2048, dtype=np.uint64)
        nm = rng.integers(0, min(d, 1 << 24), size=2048, dtype=np.uint64)
        prod = x * nm
        hi = (prod >> 32).astype(np.uint32)
        lo = (prod & 0xFFFFFFFF).astype(np.uint32)
        q, r = mm.divmod_hilo(jnp.asarray(hi), jnp.asarray(lo), d)
        np.testing.assert_array_equal(np.asarray(q), (prod // d).astype(np.uint32))
        np.testing.assert_array_equal(np.asarray(r), (prod % d).astype(np.uint32))
