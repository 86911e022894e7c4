"""uint32 modular arithmetic core (TPU-native replacement for DarkIntegers.jl).

The reference delegates all ring arithmetic to DarkIntegers (ModUInt/MgModUInt/
MLUInt; see SURVEY.md §2.3). TPUs have no 64-bit integer multiplier, so this
layer builds everything from 32x32->64 products emulated with 16-bit halves:

 - `mulhilo`           : exact 64-bit product as (hi, lo) uint32 pair
                         (DarkIntegers `mulhilo`, reference src/utils.jl:81)
 - `shoup_mul`         : a*w mod p for a precomputed constant w (Shoup's trick;
                         one mulhi + two low mults). Valid for ANY a < 2^32
                         when p < 2^31; this is the hot-path multiplier for
                         NTT twiddles, bootstrap-key entries and RNS constants.
 - `mod_u32`           : reduce a full uint32 mod p via precomputed mu.
 - `mulmod`            : generic a*b mod p (Barrett-style), for setup paths.
 - `rescale` / `divmod_hilo`: exact proportional rescale (DarkIntegers
                         `mulhilo`+`divremhilo`; reference src/utils.jl:78-92).

All functions are elementwise jnp ops: every argument may be an array, and the
modulus p (with its companions) may broadcast — RNS limbs ride a (L, 1) axis.
Moduli must be < 2^30 (asserted at plan-build time), which leaves slack for
the conditional-subtract idioms below and for lazy additions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
# numpy scalar, NOT a jnp device array: these appear inside Pallas kernel
# bodies, where captured device-array constants are not allowed.
_MASK16 = np.uint32(0xFFFF)


def mulhilo(a, b):
    """Exact 64-bit product of uint32 a, b as (hi, lo) uint32 pair."""
    a = a.astype(U32) if hasattr(a, "astype") else jnp.uint32(a)
    b = b.astype(U32) if hasattr(b, "astype") else jnp.uint32(b)
    a0 = a & _MASK16
    a1 = a >> 16
    b0 = b & _MASK16
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    # cross terms: (ll >> 16) + (lh & 0xffff) + (hl & 0xffff) <= 3*(2^16-1) < 2^18
    cross = (ll >> 16) + (lh & _MASK16) + (hl & _MASK16)
    lo = (ll & _MASK16) | (cross << 16)
    hi = hh + (lh >> 16) + (hl >> 16) + (cross >> 16)
    return hi, lo


def mulhi(a, b):
    """High 32 bits of the 64-bit product."""
    return mulhilo(a, b)[0]


def addmod(a, b, p):
    """(a + b) mod p for a, b < p < 2^31."""
    s = a + b
    return jnp.where(s >= p, s - p, s)


def submod(a, b, p):
    """(a - b) mod p for a, b < p."""
    d = a - b
    return jnp.where(a < b, d + p, d)


def negmod(a, p):
    """(-a) mod p for a < p."""
    return jnp.where(a == 0, a, p - a)


def mod_u32(x, p, mu):
    """x mod p for any uint32 x and any p < 2^32; mu = floor(2^32/p).

    Quotient estimate q = mulhi(x, mu) never overshoots and undershoots
    floor(x/p) by at most 2, so x - q*p is exact in uint32 (it is <= x) and
    two conditional subtracts finish the reduction.
    """
    q = mulhi(x, mu)
    r = x - q * p
    r = jnp.where(r >= p, r - p, r)
    r = jnp.where(r >= p, r - p, r)
    return r


def shoup_mul(a, w, w_shoup, p):
    """a * w mod p with precomputed w_shoup = floor(w * 2^32 / p).

    Exact for any a < 2^32 and w < p < 2^31: the remainder estimate lies in
    [0, 2p) so one conditional subtract suffices, and 2p < 2^32 means the
    wrapping uint32 arithmetic below cannot alias.
    """
    q = mulhi(a, w_shoup)
    r = a * w - q * p  # wraps mod 2^32; true value < 2p
    return jnp.where(r >= p, r - p, r)


def shoup_mul_lazy(a, w, w_shoup, p):
    """Shoup multiply WITHOUT the final conditional subtract: returns a value
    congruent to a*w mod p in [0, 2p). Harvey-style lazy reduction for hot
    loops where the consumer tolerates non-canonical residues (any u32 input
    is fine for a further shoup multiply)."""
    q = mulhi(a, w_shoup)
    return a * w - q * p


def embed_signed(x, p, mu, r_mod_p):
    """Residue of a signed int32 array mod p (any p < 2^31).

    Works for the FULL int32 range: reinterpret as uint32 (x mod 2^32), reduce
    mod p, then remove the 2^32 offset for negatives. Use this for noise /
    mask samples whose range may exceed p — a bare `where(x<0, x+p, x)` is
    only correct when |x| < p.
    """
    xu = x.astype(U32)
    r0 = mod_u32(xu, p, mu)
    corr = jnp.where(x < 0, r_mod_p, jnp.zeros_like(r_mod_p))
    return submod(r0, jnp.broadcast_to(corr, r0.shape), p)


def mulmod(a, b, p, mu, r_mod_p, r_shoup):
    """Generic a*b mod p for a, b < 2^32 (Barrett via hi/lo split).

    a*b = hi*2^32 + lo  =>  (hi mod p)*(2^32 mod p) + (lo mod p)  (mod p).
    r_mod_p = 2^32 mod p with its Shoup companion r_shoup are per-modulus
    constants. Setup-path only; hot paths use `shoup_mul`.
    """
    hi, lo = mulhilo(a, b)
    t = shoup_mul(mod_u32(hi, p, mu), r_mod_p, r_shoup, p)
    return addmod(t, mod_u32(lo, p, mu), p)


def powmod(a, e: int, p, mu, r_mod_p, r_shoup):
    """a^e mod p for a static Python-int exponent (square and multiply)."""
    result = jnp.ones_like(a)
    base = a
    while e > 0:
        if e & 1:
            result = mulmod(result, base, p, mu, r_mod_p, r_shoup)
        base = mulmod(base, base, p, mu, r_mod_p, r_shoup)
        e >>= 1
    return result


def divmod_hilo(hi, lo, d: int):
    """Exact (q, r) = divmod(hi*2^32 + lo, d) for a STATIC divisor d.

    Requires the true quotient < 2^24 (so it is exactly representable in f32)
    and hi < d. A float32 estimate is corrected by an exact signed fixup: the
    relative f32 error is ~2^-23 of a quotient < 2^24, i.e. at most ~2 either
    way (+1 ulp of the division), so 6 fixup rounds are ample.

    This is the TPU equivalent of DarkIntegers' divremhilo on the rescale path
    (reference src/utils.jl:78-92).
    """
    d = int(d)
    assert 2 <= d < (1 << 28), "divisor range (signed fixup must fit int32)"
    est = (
        hi.astype(jnp.float32) * jnp.float32(4294967296.0) + lo.astype(jnp.float32)
    ) / jnp.float32(d)
    q = est.astype(U32)
    # signed remainder, exact in wrapping uint32 then reinterpreted
    rem = (lo - q * U32(d)).astype(jnp.int32)  # true rem fits int32 by err bound
    n_fix = 6
    di = jnp.int32(d)
    for _ in range(n_fix):
        under = rem < 0
        q = jnp.where(under, q - 1, q)
        rem = jnp.where(under, rem + di, rem)
    for _ in range(n_fix):
        over = rem >= di
        q = jnp.where(over, q + 1, q)
        rem = jnp.where(over, rem - di, rem)
    return q, rem.astype(U32)


def rescale(new_max: int, x, old_max: int, round_result: bool):
    """floor/round(x * new_max / old_max), with round-to-new_max wrapping to 0.

    Exact; mirrors reference src/utils.jl:78-92 including the `q == new_max -> 0`
    wrap on the rounding path and the odd-modulus half-interval adjustment.
    Static new_max/old_max (they come from Params).
    """
    new_max = int(new_max)
    old_max = int(old_max)
    assert new_max < (1 << 24), "rescale quotient bound"
    hi, lo = mulhilo(x, jnp.uint32(new_max))
    q, r = divmod_hilo(hi, lo, old_max)
    if round_result:
        half = old_max // 2 + (1 if old_max % 2 == 1 else 0)
        q = jnp.where(r >= jnp.uint32(half), q + 1, q)
        q = jnp.where(q == jnp.uint32(new_max), jnp.zeros_like(q), q)
    return q


# ---------------------------------------------------------------------------
# Host-side (Python int) companions, computed once per modulus at setup time.
# ---------------------------------------------------------------------------


def shoup_const(w: int, p: int) -> int:
    """floor(w * 2^32 / p) for w < p."""
    return (int(w) << 32) // int(p)


def barrett_mu(p: int) -> int:
    """floor(2^32 / p)."""
    return (1 << 32) // int(p)
