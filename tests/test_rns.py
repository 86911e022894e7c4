"""RNS context tests: CRT roundtrip, mixed-radix flatten reconstruction and
digit bounds (mirrors reference test/internals.test.jl:50-141), randomized
flatten, and the exact round/floor rescale (vs a big-int oracle, with
adversarial boundary inputs)."""

import numpy as np
import jax
import jax.numpy as jnp

from sgfhe_tpu.ops import rns
from sgfhe_tpu.utils import primes as pr


def small_ctx():
    # three small NTT-friendly primes (stride 128)
    mods = []
    start = 1 << 14
    while len(mods) < 3:
        q = pr.find_modulus(128, start)
        mods.append(q)
        start = q + 1
    return rns.build_context(tuple(mods))


def test_crt_roundtrip():
    host = small_ctx()
    rng = np.random.default_rng(0)
    xs = [int(rng.integers(0, 1 << 40)) % host.Q for _ in range(64)] + [0, host.Q - 1]
    res = host.to_rns(np.array(xs, dtype=object))
    back = host.from_rns(res)
    assert [int(v) for v in back] == xs


def test_flatten_reconstruction_and_bounds():
    host = small_ctx()
    ctx = host.device_context()
    rng = np.random.default_rng(1)
    m = 16
    xs = np.array(
        [int(rng.integers(0, 1 << 44)) % host.Q for _ in range(m)], dtype=object
    )
    x_rns = host.to_rns(xs)  # (L, m)
    digits = np.asarray(rns.flatten(ctx, jnp.asarray(x_rns)))  # (L_d, L, m)
    # reconstruction: sum_i w_i * digit_i == x (mod Q)
    recon = np.zeros(m, dtype=object)
    for i in range(host.L):
        # digit i value: interpret from its residues (all limbs agree on the
        # centered value); decode from limb i... use CRT then center
        dv = host.from_rns(digits[i])
        centered = np.array(
            [int(v) if int(v) <= host.Q // 2 else int(v) - host.Q for v in dv],
            dtype=object,
        )
        # bound check: |digit| <= (p_i - 1) / 2
        s = (host.moduli[i] - 1) // 2
        assert all(abs(c) <= s for c in centered), (i, centered[:4], s)
        recon = recon + centered * host.weights[i]
    assert all(int(r) % host.Q == int(x) for r, x in zip(recon, xs))


def test_flatten_random_reconstruction_and_bounds():
    host = small_ctx()
    ctx = host.device_context()
    rng = np.random.default_rng(2)
    m = 16
    xs = np.array(
        [int(rng.integers(0, 1 << 44)) % host.Q for _ in range(m)], dtype=object
    )
    x_rns = host.to_rns(xs)
    seed2 = rns.seed_words(jax.random.key(7))
    digits = np.asarray(
        rns.flatten_random(ctx, jnp.asarray(x_rns), host.moduli, seed2, 0)
    )
    recon = np.zeros(m, dtype=object)
    for i in range(host.L):
        dv = host.from_rns(digits[i])
        centered = np.array(
            [int(v) if int(v) <= host.Q // 2 else int(v) - host.Q for v in dv],
            dtype=object,
        )
        # randomized bound: window 2^k (>= 3s) + digit s, within (-4p, 4p)
        bound = (1 << rns.mask_window_bits(host.moduli[i])) + (
            host.moduli[i] - 1
        ) // 2
        assert bound < 4 * host.moduli[i]
        assert all(abs(c) <= bound for c in centered)
        recon = recon + centered * host.weights[i]
    assert all(int(r) % host.Q == int(x) for r, x in zip(recon, xs))
    # determinism given the key
    digits2 = np.asarray(
        rns.flatten_random(ctx, jnp.asarray(x_rns), host.moduli, seed2, 0)
    )
    np.testing.assert_array_equal(digits, digits2)


def _crt_signed(host, residues: np.ndarray) -> np.ndarray:
    """Vectorized int64 CRT decode of (L, M) residues -> centered signed
    values in (-Q/2, Q/2] (valid for any tiny-Q sweep set: all intermediate
    products stay < 2^63)."""
    M = residues.shape[-1]
    acc = np.zeros(M, dtype=np.int64)
    for i, p in enumerate(host.moduli):
        qi = host.Q // p
        ci = pr.inv_mod(qi, p)
        acc = (acc + residues[i].astype(np.int64) * ((qi * ci) % host.Q)) % host.Q
    return np.where(acc > host.Q // 2, acc - host.Q, acc)


import pytest


@pytest.mark.parametrize(
    "mods",
    [(641, 769), (11, 13, 61)],
    ids=["close-2limb", "nonclose-3limb"],
)
def test_flatten_exhaustive_full_domain(mods):
    """EVERY element of Z_Q through flatten and flatten_random for tiny
    prime products (Q < 2^20) — the direct port of the reference's
    exhaustive flatten sweep (test/internals.test.jl:50-112), covering both
    the close-prime conditional-subtract path and the Barrett fallback.
    Checks reconstruction sum_i w_i*d_i == x (mod Q) and the digit bounds
    for all Q inputs in one jit call per mode."""
    host = rns.build_context(mods)
    ctx = host.device_context()
    assert ctx.close_primes == pr.close_primes(mods)
    Q = host.Q
    assert Q < 1 << 20
    xs = np.arange(Q, dtype=np.int64)
    x_rns = np.stack([(xs % p).astype(np.uint32) for p in mods])  # (L, Q)

    digits = np.asarray(jax.jit(rns.flatten)(ctx, jnp.asarray(x_rns)))
    recon = np.zeros(Q, dtype=np.int64)
    for i in range(host.L):
        d = _crt_signed(host, digits[i])
        s = (mods[i] - 1) // 2
        assert int(np.abs(d).max()) <= s, (i, int(np.abs(d).max()), s)
        recon += d * host.weights[i]
    assert (recon % Q == xs).all()

    seed2 = rns.seed_words(jax.random.key(29))
    f_rand = jax.jit(
        lambda c, x, s: rns.flatten_random(c, x, mods, s, jnp.uint32(0))
    )
    digits_r = np.asarray(f_rand(ctx, jnp.asarray(x_rns), seed2))
    recon = np.zeros(Q, dtype=np.int64)
    for i in range(host.L):
        d = _crt_signed(host, digits_r[i])
        bound = (1 << rns.mask_window_bits(mods[i])) + (mods[i] - 1) // 2
        assert bound < 4 * mods[i]
        assert int(np.abs(d).max()) <= bound
        recon += d * host.weights[i]
    assert (recon % Q == xs).all()


def _boundary_cases(Q: int, new_max: int) -> list[int]:
    """Adversarial inputs: the x in [0, Q) closest to every rounding boundary
    q + 1/2 (and floor boundary q) of x*new_max/Q, from both sides."""
    xs = []
    for q in range(new_max):
        # x*new_max/Q == q + 1/2  <=>  x == (2q+1)Q / (2 new_max)
        num = (2 * q + 1) * Q
        lo = num // (2 * new_max)
        xs.extend([lo, lo + 1])
        # floor boundary x*new_max/Q == q  <=>  x == qQ/new_max
        lo_f = (q * Q) // new_max
        xs.extend([lo_f, lo_f + 1])
    xs.extend([0, 1, Q - 1, Q // 2, Q // 2 + 1])
    return [x % Q for x in xs]


def test_rescale_exact_round_and_floor():
    host = small_ctx()
    ctx = host.device_context()
    new_max = 1024
    rng = np.random.default_rng(3)
    xs = [int(rng.integers(0, 1 << 44)) % host.Q for _ in range(256)]
    xs += _boundary_cases(host.Q, new_max)
    xs = np.array(xs, dtype=object)
    x_rns = host.to_rns(xs)
    got_r = np.asarray(
        rns.rescale_exact(ctx, jnp.asarray(x_rns), new_max, host.moduli, True)
    )
    got_f = np.asarray(
        rns.rescale_exact(ctx, jnp.asarray(x_rns), new_max, host.moduli, False)
    )
    for gr, gf, x in zip(got_r, got_f, xs):
        exact_r = (int(x) * new_max + host.Q // 2) // host.Q % new_max
        exact_f = (int(x) * new_max) // host.Q % new_max
        assert int(gr) == exact_r, (int(x), int(gr), exact_r)
        assert int(gf) == exact_f, (int(x), int(gf), exact_f)


def test_rescale_wide_single_modulus():
    """rescale_wide must match the big-int oracle for q beyond mm.rescale's
    2^28 fixup bound (the Params(4096) regime), round and floor, including
    all boundary cases."""
    q = pr.find_modulus(8192, (1 << 29) + 1)  # a ~29-bit prime
    new_max = 1 << 16
    rng = np.random.default_rng(5)
    xs = [int(v) % q for v in rng.integers(0, q, 256)]
    for k in rng.integers(0, new_max, 64):
        lo = ((2 * int(k) + 1) * q) // (2 * new_max)
        lof = (int(k) * q) // new_max
        xs.extend([lo % q, (lo + 1) % q, lof % q, (lof + 1) % q])
    x = jnp.asarray(np.array(xs, dtype=np.uint32))
    got_r = np.asarray(rns.rescale_wide(new_max, x, q, True))
    got_f = np.asarray(rns.rescale_wide(new_max, x, q, False))
    for gr, gf, v in zip(got_r, got_f, xs):
        assert int(gr) == (v * new_max + q // 2) // q % new_max
        assert int(gf) == (v * new_max) // q % new_max


def test_rescale_exact_wide_rns():
    """Production-width check: Params(512)-like moduli (3 x ~27-bit primes,
    Q ~ 2^81) against a big-int oracle, including boundary cases."""
    mods = pr.find_rns_primes(8192, 1220 * (8192**4) * (512**2),
                              1225 * (8192**4) * (512**2), 3)
    host = rns.build_context(mods)
    ctx = host.device_context()
    new_max = 8192
    rng = np.random.default_rng(4)
    xs = [
        (int(rng.integers(0, 1 << 62)) * int(rng.integers(0, 1 << 62))) % host.Q
        for _ in range(128)
    ]
    # boundary cases around a sample of rounding boundaries
    for q in rng.integers(0, new_max, 64):
        num = (2 * int(q) + 1) * host.Q
        lo = num // (2 * new_max)
        xs.extend([lo % host.Q, (lo + 1) % host.Q])
    xs = np.array(xs, dtype=object)
    x_rns = host.to_rns(xs)
    got = np.asarray(
        rns.rescale_exact(ctx, jnp.asarray(x_rns), new_max, host.moduli, True)
    )
    for g, x in zip(got, xs):
        exact = (int(x) * new_max + host.Q // 2) // host.Q % new_max
        assert int(g) == exact, (int(x), int(g), exact)


def test_rescale_error_budget_guarded():
    """A new_max beyond the float32 estimate's error budget must be rejected
    loudly (round-2 advisor: the ±1-correction precondition was unguarded)."""
    import pytest

    host = small_ctx()
    ctx = host.device_context()
    x = jnp.asarray(host.to_rns(np.array([1], dtype=object)))
    with pytest.raises(AssertionError, match="error budget"):
        rns.rescale_exact(ctx, x, 1 << 24, host.moduli, True)
    with pytest.raises(AssertionError, match="error budget"):
        rns.rescale_wide(1 << 24, jnp.asarray([1], dtype=jnp.uint32),
                         host.moduli[0], True)
    # the largest production size stays well inside the budget
    r_4096 = 16 * 4096
    assert (len(host.moduli) + 3) * 2 * r_4096 <= (1 << 21)
