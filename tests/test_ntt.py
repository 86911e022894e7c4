"""NTT property tests against independent bignum oracles (SURVEY.md §7 phase 2:
NTT∘iNTT = id; NTT-mul == schoolbook negacyclic mul)."""

import numpy as np
import jax.numpy as jnp

from sgfhe_tpu.ops import ntt
from sgfhe_tpu.utils import primes as pr


def negacyclic_mul_oracle(a, b, p):
    """Schoolbook negacyclic product with Python ints (exact)."""
    m = len(a)
    out = [0] * m
    for i in range(m):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(m):
            k = i + j
            v = ai * int(b[j])
            if k < m:
                out[k] = (out[k] + v) % p
            else:
                out[k - m] = (out[k - m] - v) % p
    return np.array([x % p for x in out], dtype=np.uint32)


def make_plan(m=64, nlimbs=2):
    mods = []
    start = 1 << 25
    while len(mods) < nlimbs:
        q = pr.find_modulus(2 * m, start)
        mods.append(q)
        start = q + 1
    return ntt.build_plan(tuple(mods), m), mods


def test_roundtrip():
    plan, mods = make_plan(m=128, nlimbs=3)
    rng = np.random.default_rng(0)
    x = np.stack(
        [rng.integers(0, p, size=(4, 128), dtype=np.uint32) for p in mods], axis=-2
    )  # (4, L, m)
    back = np.asarray(ntt.ntt_inv(plan, ntt.ntt_fwd(plan, jnp.asarray(x))))
    np.testing.assert_array_equal(back, x)


def test_polymul_vs_oracle():
    plan, mods = make_plan(m=32, nlimbs=2)
    rng = np.random.default_rng(1)
    a = np.stack([rng.integers(0, p, size=32, dtype=np.uint32) for p in mods])
    b = np.stack([rng.integers(0, p, size=32, dtype=np.uint32) for p in mods])
    got = np.asarray(ntt.polymul(plan, jnp.asarray(a), jnp.asarray(b)))
    for li, p in enumerate(mods):
        expect = negacyclic_mul_oracle(a[li], b[li], p)
        np.testing.assert_array_equal(got[li], expect)


def test_monomial_mul_hat_matches_coefficient_rotation():
    plan, mods = make_plan(m=32, nlimbs=2)
    rng = np.random.default_rng(2)
    a = np.stack([rng.integers(0, p, size=32, dtype=np.uint32) for p in mods])
    m = 32

    a_hat = ntt.ntt_fwd(plan, jnp.asarray(a))
    for j in (0, 1, 5, 31, 32, 33, 63):
        rot_hat = ntt.monomial_mul_hat(plan, a_hat, jnp.asarray(j))
        rot = np.asarray(ntt.ntt_inv(plan, rot_hat))
        # oracle: multiply by x^j with negacyclic wrap
        for li, p in enumerate(mods):
            expect = np.zeros(m, dtype=np.uint32)
            for i in range(m):
                k = (i + j) % (2 * m)
                sign = 1 if k < m else -1
                expect[k % m] = (sign * int(a[li, i])) % p
            np.testing.assert_array_equal(rot[li], expect, err_msg=f"j={j} limb={li}")


def test_batched_shapes():
    plan, mods = make_plan(m=64, nlimbs=2)
    rng = np.random.default_rng(3)
    x = rng.integers(0, min(mods), size=(3, 5, 2, 64), dtype=np.uint32)
    y = np.asarray(ntt.ntt_fwd(plan, jnp.asarray(x)))
    assert y.shape == x.shape
    back = np.asarray(ntt.ntt_inv(plan, jnp.asarray(y)))
    np.testing.assert_array_equal(back, x)


def test_negacyclic_mul_bits_vs_toeplitz_oracle():
    """The NTT-backed exact negacyclic-by-bits product (ops/poly.py,
    the encrypt/decrypt backend since round 5 — the n x n toeplitz matmul
    lowers to a scalar-rate n^2 loop on TPU) against the toeplitz oracle,
    on the length-n ring (helper primes = q's factors) and the length-m
    ring (helper primes = Q's factors), batched and unbatched."""
    import jax

    from sgfhe_tpu.models.params import Params
    from sgfhe_tpu.ops import poly as P

    rng = np.random.default_rng(2)
    for n in (64, 256):
        p = Params.create(n)
        a = jnp.asarray(rng.integers(0, p.r, (3, n)).astype(np.uint32))
        s = jnp.asarray(rng.integers(0, 2, n).astype(np.uint32))
        ref = jax.jit(
            lambda a, s: P.negacyclic_matmul_mask(
                a, P.toeplitz_from_small(s), p.mask_r
            )
        )(a, s)
        got = jax.jit(
            lambda a, s: P.negacyclic_mul_bits(a, s, p.mask_r, p.q_factors)
        )(a, s)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        m = p.m
        am = jnp.asarray(rng.integers(0, p.r, (m,)).astype(np.uint32))
        sm = jnp.asarray(
            np.concatenate([np.asarray(s), np.zeros(m - n, np.uint32)])
        )
        refm = jax.jit(
            lambda a, s: P.negacyclic_matmul_mask(
                a, P.toeplitz_from_small(s), p.mask_r
            )
        )(am, sm)
        gotm = jax.jit(
            lambda a, s: P.negacyclic_mul_bits(a, s, p.mask_r, p.moduli)
        )(am, sm)
        np.testing.assert_array_equal(np.asarray(gotm), np.asarray(refm))
        # all-ones key and all-max operand: the worst-case coefficient
        # magnitude the unique-lift bound must absorb
        aw = jnp.full((n,), p.r - 1, jnp.uint32)
        sw = jnp.ones((n,), jnp.uint32)
        refw = jax.jit(
            lambda a, s: P.negacyclic_matmul_mask(
                a, P.toeplitz_from_small(s), p.mask_r
            )
        )(aw, sw)
        gotw = jax.jit(
            lambda a, s: P.negacyclic_mul_bits(a, s, p.mask_r, p.q_factors)
        )(aw, sw)
        np.testing.assert_array_equal(np.asarray(gotw), np.asarray(refw))
