"""RNS context tests: CRT roundtrip, mixed-radix flatten reconstruction and
digit bounds (mirrors reference test/internals.test.jl:50-141), randomized
flatten, and approximate rescale-to-r."""

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
    key = jax.random.key(7)
    digits = np.asarray(
        rns.flatten_random(ctx, jnp.asarray(x_rns), key, host.moduli)
    )
    recon = np.zeros(m, dtype=object)
    for i in range(host.L):
        dv = host.from_rns(digits[i])
        centered = np.array(
            [int(v) if int(v) <= host.Q // 2 else int(v) - host.Q for v in dv],
            dtype=object,
        )
        # randomized bound: within (-2 p_i, 2 p_i)
        assert all(abs(c) < 2 * host.moduli[i] for c in centered)
        recon = recon + centered * host.weights[i]
    assert all(int(r) % host.Q == int(x) for r, x in zip(recon, xs))
    # determinism given the key
    digits2 = np.asarray(
        rns.flatten_random(ctx, jnp.asarray(x_rns), key, host.moduli)
    )
    np.testing.assert_array_equal(digits, digits2)


def test_rescale_round():
    host = small_ctx()
    new_max = 1024
    ctx = host.device_context(new_max=new_max)
    rng = np.random.default_rng(3)
    xs = np.array(
        [int(rng.integers(0, 1 << 44)) % host.Q for _ in range(256)], dtype=object
    )
    x_rns = host.to_rns(xs)
    got = np.asarray(rns.rescale_round(ctx, jnp.asarray(x_rns), new_max - 1))
    for g, x in zip(got, xs):
        exact = (int(x) * new_max + host.Q // 2) // host.Q % new_max
        # allow ±1 for float rounding at half-boundaries
        diff = min((int(g) - exact) % new_max, (exact - int(g)) % new_max)
        assert diff <= 1, (int(g), exact)
