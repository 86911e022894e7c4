"""RNS (residue number system) context for the big modulus Q.

The reference represents Q as one big prime and does wide-int arithmetic via
DarkIntegers (UInt64/UInt128/MLUInt; SURVEY.md §2.3) — including the base-B
gadget decomposition `flatten` which divrems the POSITIONAL value
(reference src/utils.jl:155-189). On a TPU with 32-bit lanes that design is
hostile, so this framework makes the representation the reference's own
experimental scheme-2 already validates (src/fhe2.jl:57-60 `Q = B*Bp`,
src/rns.jl): **Q is a product of L NTT-friendly primes < 2^30**, and the
gadget decomposition is the balanced MIXED-RADIX expansion over those primes:

    x  =  d_1 + d_2*p_1 + d_3*p_1*p_2 + ...   with  d_i in (-p_i/2, p_i/2]

Digit extraction is then pure componentwise RNS arithmetic (no positional
lift): d_1 = x mod p_1 and each further digit is a Shoup multiply + subtract
chain per limb — this resolves SURVEY.md §7 "hard part #1" natively.

The gadget matrix G (reference src/fhe.jl:119-122, l=2 hardcoded) generalizes
to 2L x 2 with weights w_i = prod_{j<i} p_j, and the external-product identity
(a, b) ⊙ G == (a, b) holds exactly — tested against the reference property
(test/internals.test.jl:144-166).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import primes as pr
from . import modmath as mm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RnsContext:
    """Constants for a modulus Q = prod(p_i); all tables are device arrays.

    Array shape conventions: RNS data is (..., L, m) with the limb axis at -2;
    all per-limb constants here are (L, 1) and per-(digit, limb) tables are
    (L', L, 1) so they broadcast cleanly.
    """

    p: jax.Array             # (L, 1) uint32
    mu: jax.Array            # (L, 1) floor(2^32/p)
    # mixed-radix extraction constants: for digit i (1-indexed i >= 2) the
    # chain subtracts d_j and multiplies by inv(p_j) mod p_i for j < i.
    # stored dense: inv_pj_mod_pi[i, j] with shoup companions (zeros unused).
    inv_pj_val: jax.Array    # (L, L) uint32: inv(p_j) mod p_i for j < i
    inv_pj_shoup: jax.Array  # (L, L)
    # gadget weights w_i = prod_{j<i} p_j, embedded per limb, with companions
    w_val: jax.Array         # (L, L, 1): w_val[i, k] = w_i mod p_k
    w_shoup: jax.Array       # (L, L, 1)
    # balanced-digit offsets s_i = (p_i - 1) / 2
    s_digit: jax.Array       # (L, 1) uint32: s_i (plain value, < p_i)
    s_mod: jax.Array         # (L, L, 1): s_i mod p_k
    offset: jax.Array        # (L, 1): sum_i w_i * s_i mod p_k (per limb k)
    # exact-rounding rescale-to-r constants: c_i = inv(Q/p_i) mod p_i
    c_val: jax.Array         # (L, 1)
    c_shoup: jax.Array       # (L, 1)
    r_over_p: jax.Array      # (L, 1) float32: new_max / p_i  (set per new_max!)


def build_context(moduli: tuple[int, ...]) -> "RnsContextHost":
    return RnsContextHost(tuple(int(p) for p in moduli))


class RnsContextHost:
    """Host-side companion holding Python-int constants; builds device ctx."""

    def __init__(self, moduli: tuple[int, ...]):
        self.moduli = moduli
        self.L = len(moduli)
        self.Q = 1
        for p in moduli:
            self.Q *= p
        # mixed-radix weights
        self.weights = []
        w = 1
        for p in moduli:
            self.weights.append(w)
            w *= p
        self.s = [(p - 1) // 2 for p in moduli]
        self.offset_int = sum(wi * si for wi, si in zip(self.weights, self.s)) % self.Q

    def to_rns(self, x) -> np.ndarray:
        """Python int / array of ints -> (L, ...) uint32 residues."""
        arr = np.asarray(x, dtype=object)
        out = np.empty((self.L,) + arr.shape, dtype=np.uint32)
        for i, p in enumerate(self.moduli):
            out[i] = np.vectorize(lambda v: int(v) % p, otypes=[np.uint32])(arr)
        return out

    def from_rns(self, residues: np.ndarray):
        """(L, ...) residues -> object array of Python ints in [0, Q) (CRT).

        Mirrors the reference's convert-out (src/rns.jl:32-40) generalized to
        L moduli.
        """
        res = np.zeros(residues.shape[1:], dtype=object)
        for i, p in enumerate(self.moduli):
            qi = self.Q // p
            ci = pr.inv_mod(qi, p)
            res = res + residues[i].astype(object) * (qi * ci)
        return np.vectorize(lambda v: int(v) % self.Q, otypes=[object])(res)

    def device_context(self, new_max: int | None = None) -> RnsContext:
        L = len(self.moduli)
        mods = self.moduli
        p = np.array(mods, dtype=np.uint32).reshape(L, 1)
        mu = np.array([mm.barrett_mu(q) for q in mods], dtype=np.uint32).reshape(L, 1)
        inv_pj_val = np.zeros((L, L), dtype=np.uint32)
        inv_pj_shoup = np.zeros((L, L), dtype=np.uint32)
        for i in range(L):
            for j in range(i):
                v = pr.inv_mod(mods[j], mods[i])
                inv_pj_val[i, j] = v
                inv_pj_shoup[i, j] = mm.shoup_const(v, mods[i])
        w_val = np.zeros((L, L, 1), dtype=np.uint32)
        w_shoup = np.zeros((L, L, 1), dtype=np.uint32)
        s_mod = np.zeros((L, L, 1), dtype=np.uint32)
        for i in range(L):
            for k in range(L):
                wv = self.weights[i] % mods[k]
                w_val[i, k, 0] = wv
                w_shoup[i, k, 0] = mm.shoup_const(wv, mods[k])
                s_mod[i, k, 0] = self.s[i] % mods[k]
        s_digit = np.array(self.s, dtype=np.uint32).reshape(L, 1)
        offset = np.array(
            [self.offset_int % q for q in mods], dtype=np.uint32
        ).reshape(L, 1)
        c_val = np.zeros((L, 1), dtype=np.uint32)
        c_shoup = np.zeros((L, 1), dtype=np.uint32)
        for i, q in enumerate(mods):
            ci = pr.inv_mod(self.Q // q, q)
            c_val[i, 0] = ci
            c_shoup[i, 0] = mm.shoup_const(ci, q)
        nm = float(new_max) if new_max is not None else 1.0
        r_over_p = (nm / np.array(mods, dtype=np.float64)).astype(np.float32).reshape(
            L, 1
        )
        return RnsContext(
            p=jnp.asarray(p),
            mu=jnp.asarray(mu),
            inv_pj_val=jnp.asarray(inv_pj_val),
            inv_pj_shoup=jnp.asarray(inv_pj_shoup),
            w_val=jnp.asarray(w_val),
            w_shoup=jnp.asarray(w_shoup),
            s_digit=jnp.asarray(s_digit),
            s_mod=jnp.asarray(s_mod),
            offset=jnp.asarray(offset),
            c_val=jnp.asarray(c_val),
            c_shoup=jnp.asarray(c_shoup),
            r_over_p=jnp.asarray(r_over_p),
        )


# ---------------------------------------------------------------------------
# Device-side ops
# ---------------------------------------------------------------------------


def add(ctx: RnsContext, a, b):
    return mm.addmod(a, b, ctx.p)


def sub(ctx: RnsContext, a, b):
    return mm.submod(a, b, ctx.p)


def neg(ctx: RnsContext, a):
    return mm.negmod(a, ctx.p)


def flatten(ctx: RnsContext, x: jax.Array) -> jax.Array:
    """Balanced mixed-radix gadget decomposition (deterministic `flatten`).

    x: (..., L, m) residues of values in [0, Q).
    Returns (..., L_digits, L, m): digit i re-embedded across all limbs, where
    digit values are the balanced digits d_i - s_i represented mod each p_k.
    Satisfies sum_i w_i * digit_i == x (mod Q) exactly — the reference's
    reconstruction property (test/internals.test.jl:50-112) with digit bound
    |d_i| <= (p_i-1)/2 (analog of the (-B/2, B/2] range, src/utils.jl:150-154).
    """
    L = ctx.p.shape[0]
    # shift by the offset so unsigned mixed-radix digits become balanced
    y = mm.addmod(x, ctx.offset, ctx.p)
    # mixed-radix extraction: digits as plain uint32 (value of d_i in [0, p_i))
    digits = []
    for i in range(L):
        t = y[..., i, :]
        pi = ctx.p[i]  # (1,) broadcast
        for j in range(i):
            dj_mod_pi = mm.mod_u32(digits[j], pi, ctx.mu[i])
            t = mm.submod(t, dj_mod_pi, pi)
            t = mm.shoup_mul(t, ctx.inv_pj_val[i, j], ctx.inv_pj_shoup[i, j], pi)
        digits.append(t)
    # embed each digit into all limbs and subtract the balancing offset s_i
    out = []
    for i in range(L):
        d = digits[i][..., None, :]  # (..., 1, m)
        e = mm.mod_u32(d, ctx.p, ctx.mu)  # (..., L, m)
        e = mm.submod(e, ctx.s_mod[i], ctx.p)
        out.append(e)
    return jnp.stack(out, axis=-3)  # (..., L_digits, L, m)


def flatten_random(
    ctx: RnsContext, x: jax.Array, key: jax.Array, moduli: tuple[int, ...]
) -> jax.Array:
    """Randomized gadget decomposition (reference src/utils.jl:198-241).

    Masks each digit with a near-uniform value in [-3*s_i, 3*s_i],
    deterministically flattens the unmasked remainder, and adds the masks
    back — digit i stays within (-2*p_i, 2*p_i), matching the reference's
    (-2B, 2B] guarantee. Takes a JAX PRNG key plus the STATIC tuple of moduli
    (from Params) so the sampling spans are compile-time constants; masks are
    drawn from 48 random bits reduced mod the span (statistical distance
    < 2^-16 from uniform — the reference's `rand(rng, -xmax:xmax)` is exactly
    uniform; documented deviation).
    """
    L = ctx.p.shape[0]
    m = x.shape[-1]
    batch = x.shape[:-2]
    keys = jax.random.split(key, L)
    masks = []
    rand_x = x
    for i in range(L):
        s3 = 3 * ((moduli[i] - 1) // 2)
        span = 2 * s3 + 1  # size of [-3s, 3s]; < 2^31 since p < 2^29
        a = jax.random.bits(keys[i], batch + (m,), jnp.uint32)
        b = jax.random.bits(jax.random.fold_in(keys[i], 1), batch + (m,), jnp.uint32)
        # v = (a * 2^16 + (b & 0xffff)) mod span via 48 random bits:
        # statistical distance < 2^-16 from uniform. The shift-reduce below is
        # exact for any span < 2^31 (2t < 2^32 keeps every intermediate exact).
        sp = jnp.uint32(span)
        t = mm.mod_u32(a, sp, jnp.uint32(mm.barrett_mu(span)))
        for _ in range(16):
            t = t + t
            t = jnp.where(t >= sp, t - sp, t)
        v = t + (b & jnp.uint32(0xFFFF))
        v = jnp.where(v >= sp, v - sp, v)  # < span + 2^16 so one subtract
        # embed (v - 3 s_i) into all limbs
        u = v[..., None, :]
        e = mm.mod_u32(u, ctx.p, ctx.mu)
        s3_mod = np.array(
            [s3 % q for q in moduli], dtype=np.uint32
        ).reshape(L, 1)
        e = mm.submod(e, jnp.asarray(s3_mod), ctx.p)  # (..., L, m): mask mod p_k
        masks.append(e)
        # rand_x -= mask * w_i
        contrib = mm.shoup_mul(e, ctx.w_val[i], ctx.w_shoup[i], ctx.p)
        rand_x = mm.submod(rand_x, contrib, ctx.p)
    y = flatten(ctx, rand_x)  # (..., L, L, m)
    return mm.addmod(y, jnp.stack(masks, axis=-3), ctx.p)


def rescale_round(ctx: RnsContext, x: jax.Array, new_max_mask: int) -> jax.Array:
    """round(x * new_max / Q) mod new_max for power-of-two new_max.

    Uses the standard CRT-interpolation trick: with y_i = x_i * inv(Q/p_i)
    mod p_i, we have x/Q = sum_i y_i/p_i - alpha for an integer alpha, so
    round(x*new_max/Q) ≡ round(sum_i y_i*(new_max/p_i)) (mod new_max) since
    new_max * alpha vanishes under the mask. Float32 keeps the absolute error
    well below 0.5 digit (documented: ±1 LSB near exact-half boundaries, i.e.
    bounded extra noise — reference semantics round exactly,
    src/utils.jl:78-127).
    """
    y = mm.shoup_mul(x, ctx.c_val, ctx.c_shoup, ctx.p)  # (..., L, m)
    s = jnp.sum(y.astype(jnp.float32) * ctx.r_over_p, axis=-2)  # (..., m)
    return jnp.round(s).astype(jnp.uint32) & jnp.uint32(new_max_mask)
