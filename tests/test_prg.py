"""Threefry-2x32 correctness: the mask PRG (ops/prg.py) against an
independent pure-Python oracle written straight from the Random123 spec, and
(at 20 rounds) against JAX's own threefry2x32 implementation."""

import numpy as np
import jax.numpy as jnp

from sgfhe_tpu.ops import prg

M32 = 0xFFFFFFFF
ROT = (13, 15, 26, 6, 17, 29, 16, 24)


def ref_threefry2x32(k0, k1, c0, c1, rounds):
    """Independent oracle: plain Python ints, Random123 Threefry-2x32."""
    ks = [k0 & M32, k1 & M32, (k0 ^ k1 ^ 0x1BD11BDA) & M32]
    x0 = (c0 + ks[0]) & M32
    x1 = (c1 + ks[1]) & M32
    for i in range(rounds):
        x0 = (x0 + x1) & M32
        r = ROT[i % 8]
        x1 = ((x1 << r) | (x1 >> (32 - r))) & M32
        x1 ^= x0
        if (i + 1) % 4 == 0:
            j = (i + 1) // 4
            x0 = (x0 + ks[j % 3]) & M32
            x1 = (x1 + ks[(j + 1) % 3] + j) & M32
    return x0, x1


def test_matches_python_oracle_13_and_20():
    rng = np.random.default_rng(7)
    for rounds in (13, 20):
        k = rng.integers(0, 1 << 32, size=(2, 16), dtype=np.uint32)
        c = rng.integers(0, 1 << 32, size=(2, 16), dtype=np.uint32)
        y0, y1 = prg.threefry2x32(
            jnp.asarray(k[0]), jnp.asarray(k[1]),
            jnp.asarray(c[0]), jnp.asarray(c[1]), rounds=rounds,
        )
        for i in range(16):
            r0, r1 = ref_threefry2x32(
                int(k[0, i]), int(k[1, i]), int(c[0, i]), int(c[1, i]), rounds
            )
            assert int(np.asarray(y0)[i]) == r0
            assert int(np.asarray(y1)[i]) == r1


def test_known_answer_vectors():
    """Random123 known-answer tests for Threefry-2x32-20 (kat_vectors)."""
    # zero key, zero counter
    y0, y1 = prg.threefry2x32(0, 0, 0, 0, rounds=20)
    assert (int(y0), int(y1)) == (0x6B200159, 0x99BA4EFE)
    # all-ones
    y0, y1 = prg.threefry2x32(
        0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, rounds=20
    )
    assert (int(y0), int(y1)) == (0x1CB996FC, 0xBB002BE7)
    # pi digits vector
    y0, y1 = prg.threefry2x32(
        0x13198A2E, 0x03707344, 0x243F6A88, 0x85A308D3, rounds=20
    )
    assert (int(y0), int(y1)) == (0xC4923A9C, 0x483DF7A0)


def test_matches_jax_internal_threefry():
    """JAX's PRNG core is Threefry-2x32-20 — a second, fully independent
    implementation to cross-check the round function and key schedule."""
    try:
        from jax._src.prng import threefry_2x32 as jax_tf
    except ImportError:
        import pytest

        pytest.skip("jax internal threefry not importable")
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.integers(0, 1 << 32, size=2, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 1 << 32, size=8, dtype=np.uint32))
    # jax splits the counter array into two HALVES: lanes (c[:4], c[4:])
    ref = np.asarray(jax_tf(k, c))
    y0, y1 = prg.threefry2x32(k[0], k[1], c[:4], c[4:], rounds=20)
    got = np.concatenate([np.asarray(y0), np.asarray(y1)])
    np.testing.assert_array_equal(ref, got)


def test_avalanche_at_mask_rounds():
    """Sanity: flipping one counter bit flips ~half the output bits at the
    production round count (MASK_ROUNDS = 20, the Random123/JAX standard)."""
    assert prg.MASK_ROUNDS == 20
    y0, y1 = prg.threefry2x32(1, 2, 3, 4, rounds=prg.MASK_ROUNDS)
    z0, z1 = prg.threefry2x32(1, 2, 3, 5, rounds=prg.MASK_ROUNDS)
    flips = bin((int(y0) ^ int(z0)) | ((int(y1) ^ int(z1)) << 32)).count("1")
    assert 16 <= flips <= 48
