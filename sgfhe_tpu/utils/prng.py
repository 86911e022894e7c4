"""Deterministic PRNG expansion (reference: src/utils.jl:63-68 `prng_expand`).

The reference expands an n-bit seed `u` into n (t+1)-bit integers with
`MersenneTwister(hash(u))` and flags that as a placeholder for SHAKE-128/256.
We use JAX's counter-based threefry PRNG keyed by folding the seed bits in —
deterministic given the seed bits, jittable, and documented (the reference's
exact MersenneTwister stream is Julia-version-dependent and explicitly a
non-goal; see SURVEY.md §5 "Determinism subsystem").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fold_bits(bits: jnp.ndarray) -> jax.Array:
    """Derive a PRNG key from a (..., n) array of {0,1} bits (n mult. of 32):
    pack into 32-bit words, then fold each word into a fixed base key. One
    packing + one fold chain for both the single and batched cases (the
    batched branch used to recompute the packing via a recursive vmap)."""
    n = bits.shape[-1]
    assert n % 32 == 0
    words = bits.astype(jnp.uint32).reshape(bits.shape[:-1] + (n // 32, 32))
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(words * weights, axis=-1, dtype=jnp.uint32)  # (..., n//32)

    def chain(pk):
        def fold(key, w):
            return jax.random.fold_in(key, w), None

        key, _ = jax.lax.scan(fold, jax.random.key(0), pk)
        return key

    if packed.ndim == 1:
        return chain(packed)
    flat = jax.vmap(chain)(packed.reshape((-1, packed.shape[-1])))
    return flat.reshape(packed.shape[:-1])


def prng_expand(bits: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Expand (..., n) seed bits into (..., n) uints of `factor` bits each."""
    n = bits.shape[-1]
    if bits.ndim == 1:
        key = _fold_bits(bits)
        raw = jax.random.bits(key, (n,), jnp.uint32)
    else:
        keys = _fold_bits(bits)
        raw = jax.vmap(lambda k: jax.random.bits(k, (n,), jnp.uint32))(
            keys.reshape((-1,))
        ).reshape(bits.shape[:-1] + (n,))
    if factor >= 32:
        return raw
    return raw & jnp.uint32((1 << factor) - 1)
