"""Polynomial-layer helpers over the negacyclic ring Z_M[x]/(x^m + 1).

TPU-native equivalents of DarkIntegers' Polynomial ops consumed by the
reference (SURVEY.md §2.3): `mul_by_monomial` (src/fhe.jl:554-556 call sites),
`resize` (src/fhe.jl:185,475,676-678), LWE `extract` (src/fhe.jl:237-244), and
exact mod-r products against the {0,1} secret key (r is a power of two, so
mod-r polynomial arithmetic is int32 matmul + masking — it rides the MXU and
needs no NTT, unlike the reference which uses ring NTTs for everything).
"""

from __future__ import annotations

import functools

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
    `toeplitz_from_small`). a: (..., n) uint32 values <= mask; returns
    (..., n) masked to `mask`. Accumulation is exact in int32 when
    |sum| <= n * (mask+1) < 2^31; past that (n = 16384, r = 2^18 — the
    reference's widest `rlwe_type` regime, src/fhe.jl:71-81) the operand is
    split into two halves of ceil(k/2) bits each, so every partial sum stays
    under n * 2^ceil(k/2) < 2^25, and the halves recombine mod 2^32 (wrap is
    congruent mod 2^k, then masked).
    """
    n = w.shape[-1]
    bits = int(mask + 1).bit_length() - 1
    if n << bits >= (1 << 31):
        h = (bits + 1) // 2
        lo = (a & jnp.uint32((1 << h) - 1)).astype(jnp.int32)
        hi = (a >> h).astype(jnp.int32)
        c_lo = jnp.matmul(lo, w, preferred_element_type=jnp.int32)
        c_hi = jnp.matmul(hi, w, preferred_element_type=jnp.int32)
        c = c_lo.astype(jnp.uint32) + (c_hi.astype(jnp.uint32) << h)
        return c & jnp.uint32(mask)
    c = jnp.matmul(
        a.astype(jnp.int32), w, preferred_element_type=jnp.int32
    )
    return c.astype(jnp.uint32) & jnp.uint32(mask)


@functools.lru_cache(maxsize=None)
def _nega_plan(moduli: tuple[int, ...], length: int):
    from . import ntt as ntt_mod

    # ensure_compile_time_eval: the first call may happen while TRACING a
    # caller's jit; without it the plan's jnp constants would be tracers of
    # that trace and the lru cache would leak them into later traces.
    with jax.ensure_compile_time_eval():
        return ntt_mod.build_plan(moduli, length)


@functools.lru_cache(maxsize=None)
def _nega_rns(moduli: tuple[int, ...]):
    from . import rns as rns_mod

    with jax.ensure_compile_time_eval():
        return rns_mod.build_context(moduli).device_context()


@functools.lru_cache(maxsize=None)
def _nega_config(
    length: int, bits: int, moduli: tuple[int, ...]
) -> tuple[int, int, int]:
    """Static plan for `negacyclic_mul_bits`: split the 2^bits operand into
    `pieces` chunks of h bits and multiply each in the NTT ring over the
    first k helper primes. Exactness needs prod(moduli[:k]) > 2*length*2^h
    (piece-product coefficients are bounded by length*(2^h - 1) in absolute
    value, so they lift uniquely from the centered residue). Minimizes
    transforms = pieces * k."""
    best = None
    for pieces in range(1, 5):
        h = -(-bits // pieces)
        prod = 1
        for k, p in enumerate(moduli, 1):
            prod *= p
            if prod > 2 * length * (1 << h):
                cost = pieces * k
                if best is None or cost < best[0]:
                    best = (cost, pieces, h, k)
                break
    assert best is not None, (
        f"negacyclic_mul_bits: helper primes {moduli} too small for "
        f"length={length}, bits={bits}"
    )
    return best[1], best[2], best[3]


def negacyclic_mul_bits(
    a: jax.Array, s_bits: jax.Array, mask: int, moduli: tuple[int, ...]
) -> jax.Array:
    """Exact negacyclic product a(x) * s(x) mod (x^len + 1, 2^k) for a bit
    polynomial s in {0,1}^len, computed by NTTs over helper primes instead
    of the n x n toeplitz matmul (which XLA:TPU lowers to a scalar-rate
    n^2 loop — 2 s at n = 16384 vs sub-ms here).

    a: (..., len) uint32 values <= mask (mask+1 a power of two); s_bits:
    (len,) {0,1}. `moduli` are NTT-friendly primes for the length (2*len |
    p-1) — scheme-1 callers pass params.q_factors for the length-n ring and
    params.moduli for the length-m ring. a is split into pieces small
    enough that each piece-product's integer coefficients lift uniquely
    from their centered residues mod the helper-prime product (see
    `_nega_config`); the signed lifts recombine mod 2^32, which is exact
    mod 2^k since 2^k | 2^32. MUST be called under jit (eager NTT stages
    compile one-by-one, minutes of setup)."""
    from . import ntt as ntt_mod
    from . import rns as rns_mod

    length = a.shape[-1]
    assert s_bits.shape == (length,)
    bits = int(mask + 1).bit_length() - 1
    moduli = tuple(int(p) for p in moduli)
    pieces, h, kp = _nega_config(length, bits, moduli)
    use = moduli[:kp]
    q = 1
    for p in use:
        q *= p
    plan = _nega_plan(use, length)

    ap = jnp.stack(
        [(a >> (i * h)) & jnp.uint32((1 << h) - 1) for i in range(pieces)]
    )  # (pieces, ..., len); values < 2^h < every helper prime
    ap = jnp.broadcast_to(
        ap[..., None, :], (pieces,) + a.shape[:-1] + (kp, length)
    )
    sb = jnp.broadcast_to(s_bits.astype(jnp.uint32), (kp, length))
    prod = ntt_mod.polymul(plan, ap, sb)  # (pieces, ..., kp, len) residues

    # exact signed lift: x = sum_i d_i w_i (integers, in [0, q)); the true
    # coefficient is x, or x - q when x >= (q+1)//2 (margin is huge: the
    # coefficient bound is < q/2 by construction)
    rctx = _nega_rns(use)
    digits = rns_mod.mixed_radix_digits(rctx, prod)
    nl = q.bit_length() // 32 + 1
    acc = None
    w = 1
    for i, d in enumerate(digits):
        t = rns_mod._mll_mul_const(d, w, nl)
        acc = t if acc is None else rns_mod._mll_add(acc, t)
        w *= use[i]
    ge = rns_mod._mll_ge_const(acc, (q + 1) // 2)
    c = acc[0] - ge.astype(jnp.uint32) * jnp.uint32(q & 0xFFFFFFFF)

    out = c[0]
    for i in range(1, pieces):
        out = out + (c[i] << (i * h))
    return out & jnp.uint32(mask)


def toeplitz_from_small(s: jax.Array) -> jax.Array:
    """Negacyclic matmul matrix W[i, k] = ±s[(k - i) mod n] with sign -1 when
    k < i (wraps past x^n). s: (n,) small ints (e.g. {0,1} key bits); int32."""
    n = s.shape[-1]
    i = jnp.arange(n)[:, None]
    k = jnp.arange(n)[None, :]
    idx = (k - i) % n
    w = s.astype(jnp.int32)[idx]
    return jnp.where(k < i, -w, w)
