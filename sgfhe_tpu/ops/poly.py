"""Polynomial-layer helpers over the negacyclic ring Z_M[x]/(x^m + 1).

TPU-native equivalents of DarkIntegers' Polynomial ops consumed by the
reference (SURVEY.md §2.3): `mul_by_monomial` (src/fhe.jl:554-556 call sites),
`resize` (src/fhe.jl:185,475,676-678), LWE `extract` (src/fhe.jl:237-244), and
exact mod-r products against the {0,1} secret key (r is a power of two, so
mod-r polynomial arithmetic is int32 matmul + masking — it rides the MXU and
needs no NTT, unlike the reference which uses ring NTTs for everything).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import modmath as mm


def mul_by_monomial(x: jax.Array, j: jax.Array, p: jax.Array) -> jax.Array:
    """x(.) * x^j in Z_p[x]/(x^m+1); x: (..., m) residues, j: traced int
    array broadcastable to x.shape[:-1] (negative allowed via mod 2m).

    result[k] = sign * x[(k - j) mod m], sign = -1 when (k - j) mod 2m >= m.
    """
    m = x.shape[-1]
    j = jnp.asarray(j) % (2 * m)
    k = jnp.arange(m, dtype=jnp.int32)
    if j.ndim == 0:
        rel = (k - j) % (2 * m)
    else:
        # j's axes are x's leading batch axes; pad with singletons for the
        # remaining non-coefficient axes of x (e.g. the RNS limb axis).
        assert x.ndim - 1 >= j.ndim, (x.shape, j.shape)
        jb = j.reshape(j.shape + (1,) * (x.ndim - 1 - j.ndim))
        rel = (k - jb[..., None]) % (2 * m)
    src = (rel % m).astype(jnp.int32)
    flip = rel >= m
    out_shape = jnp.broadcast_shapes(x.shape, src.shape)
    src_b = jnp.broadcast_to(src, out_shape)
    x_b = jnp.broadcast_to(x, out_shape)
    g = jnp.take_along_axis(x_b, src_b, axis=-1)
    return jnp.where(jnp.broadcast_to(flip, out_shape), mm.negmod(g, p), g)


def resize(x: jax.Array, m: int) -> jax.Array:
    """Zero-extend the coefficient axis to length m (reference `resize`)."""
    cur = x.shape[-1]
    assert m >= cur
    pad = [(0, 0)] * (x.ndim - 1) + [(0, m - cur)]
    return jnp.pad(x, pad)


def extract(x: jax.Array, i0: int, n: int, p) -> jax.Array:
    """LWE coefficient extraction (reference src/fhe.jl:237-244, 0-based).

    out[k] = x[i0 - k] for k <= i0, else -x[m + i0 - k]. Static i0, n.
    x: (..., m) -> (..., n).
    """
    m = x.shape[-1]
    idx = [(i0 - k) % m for k in range(n)]
    neg = [(i0 - k) < 0 for k in range(n)]
    g = x[..., jnp.asarray(idx)]
    negmask = jnp.asarray(neg)
    return jnp.where(negmask, mm.negmod(g, p), g)


def negacyclic_matmul_mask(a: jax.Array, w: jax.Array, mask: int) -> jax.Array:
    """Exact negacyclic product a * s mod 2^k, where `w` is the precomputed
    ±toeplitz matrix of a small-coefficient polynomial s (built by
    `toeplitz_from_small`). a: (..., n) uint32 values < r; returns (..., n)
    masked to `mask`. Accumulation is exact in int32 (|sum| <= n * r < 2^31
    for all supported Params).
    """
    c = jnp.matmul(
        a.astype(jnp.int32), w, preferred_element_type=jnp.int32
    )
    return c.astype(jnp.uint32) & jnp.uint32(mask)


def toeplitz_from_small(s: jax.Array) -> jax.Array:
    """Negacyclic matmul matrix W[i, k] = ±s[(k - i) mod n] with sign -1 when
    k < i (wraps past x^n). s: (n,) small ints (e.g. {0,1} key bits); int32."""
    n = s.shape[-1]
    i = jnp.arange(n)[:, None]
    k = jnp.arange(n)[None, :]
    idx = (k - i) % n
    w = s.astype(jnp.int32)[idx]
    return jnp.where(k < i, -w, w)
