"""Bit packing/unpacking (reference: src/utils.jl:36-54 packbits/unpackbits).

Used by the space-optimal ciphertext encodings (6 bits per message bit for
private-key encryption, 10+log2(n) for public-key; reference src/fhe.jl:293-301,
375-383). Pure jnp, batch-friendly: bit axis is the leading axis of the bit
array, matching the reference's (itemsize, n) BitArray layout.
"""

from __future__ import annotations

import jax.numpy as jnp


def packbits(bits: jnp.ndarray) -> jnp.ndarray:
    """(itemsize, n) {0,1} array -> (n,) uint32; row i supplies bit 2^i."""
    bits = bits.astype(jnp.uint32)
    itemsize = bits.shape[0]
    weights = (jnp.uint32(1) << jnp.arange(itemsize, dtype=jnp.uint32)).reshape(
        (itemsize,) + (1,) * (bits.ndim - 1)
    )
    return jnp.sum(bits * weights, axis=0, dtype=jnp.uint32)


def unpackbits(arr: jnp.ndarray, itemsize: int) -> jnp.ndarray:
    """(n,) uint -> (itemsize, n) {0,1} uint8; row i holds bit 2^i."""
    arr = arr.astype(jnp.uint32)
    shifts = jnp.arange(itemsize, dtype=jnp.uint32).reshape(
        (itemsize,) + (1,) * arr.ndim
    )
    return ((arr[None] >> shifts) & jnp.uint32(1)).astype(jnp.uint8)
