"""Negacyclic NTT over uint32 primes — the TPU replacement for DarkIntegers'
`Polynomial * Polynomial` NTT multiplication (reference src/fhe.jl:164,195,
src/utils.jl; SURVEY.md §2.3).

Design (TPU-first):
 - All transforms are batched over arbitrary leading axes and over an RNS limb
   axis at position -2: arrays are (..., L, m). Per-limb constants broadcast
   from (L, 1)-shaped tables, so one fused elementwise graph covers all limbs.
 - ψ-twisted radix-2 transforms: forward is decimation-in-frequency
   (natural -> bit-reversed order), inverse is the mirrored
   decimation-in-time (bit-reversed -> natural), so NO explicit bit-reversal
   permutation is ever materialized: pointwise products meet in bit-reversed
   "hat" order and the inverse undoes it.
 - Every twiddle multiply is a Shoup multiply (precomputed companions), the
   cheapest exact modular multiplier on hardware without a 64-bit multiplier.
 - The per-position evaluation exponents (`eval_exp`) give, for hat position
   idx, the odd power ψ^(2*br(idx)+1) at which that slot evaluates the
   polynomial: multiplying a hat vector by `psi_pow[eval_exp * j mod 2m]`
   multiplies the polynomial by the monomial x^j. This turns the bootstrap's
   blind-rotation monomial products into table gathers (reference
   src/fhe.jl:554-556 `mul_by_xj_minus_one` — done here without leaving the
   NTT domain).

A plan is a pytree of device arrays; build it once per (moduli, m) at Params
construction.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import primes as pr
from . import modmath as mm


def _bit_reverse_indices(m: int) -> np.ndarray:
    bits = m.bit_length() - 1
    idx = np.arange(m)
    out = np.zeros(m, dtype=np.int64)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NttPlan:
    """Twiddle tables for a batch of L coprime moduli sharing length m.

    All tables carry the limb axis L first. `p`, `mu`, `r_mod_p`, `r_shoup`
    are (L, 1) so they broadcast against (..., L, m) data.
    """

    p: jax.Array          # (L, 1) uint32 moduli
    mu: jax.Array         # (L, 1) floor(2^32/p)
    r_mod_p: jax.Array    # (L, 1) 2^32 mod p (for generic mulmod)
    r_shoup: jax.Array    # (L, 1)
    fwd_tw: tuple         # per stage: ((L, half), (L, half)) value/shoup pairs
    inv_tw: tuple         # per stage (half = 1, 2, ..., m/2)
    pre_tw: jax.Array     # (L, m) ψ^i
    pre_tw_s: jax.Array
    post_tw: jax.Array    # (L, m) ψ^{-i} * m^{-1}
    post_tw_s: jax.Array
    # bit-ladder tables for gather-free monomial multiplication:
    # mono_pow[b, li, idx] = ψ^{E[idx] * 2^b mod 2m}; folding over the set
    # bits of a traced exponent u multiplies a hat vector by x^u using only
    # Shoup multiplies and selects (TPU gathers are slow).
    mono_pow: jax.Array   # (log2(2m), L, m)
    mono_pow_s: jax.Array
    # host-side copy of the moduli the device tables were built from, kept
    # STATIC so kernel dispatchers can assert at trace time that the static
    # `moduli` tuple they specialize on (close-prime fast path, mask windows)
    # is the same set the p/mu/twiddle arrays encode (round-3 advisor
    # finding: the two used to arrive via independent arguments).
    moduli: tuple = dataclasses.field(
        default=(), metadata=dict(static=True)
    )

    @property
    def num_limbs(self) -> int:
        return self.p.shape[0]

    @property
    def length(self) -> int:
        return self.pre_tw.shape[-1]


def build_plan(moduli: tuple[int, ...], m: int, negacyclic: bool = True) -> NttPlan:
    """Host-side plan construction (Python ints / numpy uint64; exact).

    negacyclic=True: ψ-twisted transform over x^m+1 (the scheme's rings).
    negacyclic=False: plain cyclic transform over x^m-1 (used by the
    distributed four-step decomposition, parallel/ntt_dist.py).
    """
    assert m >= 2 and (m & (m - 1)) == 0
    L = len(moduli)
    stages = m.bit_length() - 1
    br = _bit_reverse_indices(m)

    p_arr = np.array(moduli, dtype=np.uint32).reshape(L, 1)
    mu = np.array([mm.barrett_mu(p) for p in moduli], dtype=np.uint32).reshape(L, 1)
    r_mod_p = np.array([(1 << 32) % p for p in moduli], dtype=np.uint32).reshape(L, 1)
    r_shoup = np.array(
        [mm.shoup_const((1 << 32) % p, p) for p in moduli], dtype=np.uint32
    ).reshape(L, 1)

    fwd_stage_vals = [np.zeros((L, m >> (s + 1)), dtype=np.uint32) for s in range(stages)]
    inv_stage_vals = [np.zeros((L, 1 << s), dtype=np.uint32) for s in range(stages)]
    pre = np.zeros((L, m), dtype=np.uint32)
    post = np.zeros((L, m), dtype=np.uint32)
    psi_pow = np.zeros((L, 2 * m), dtype=np.uint32)

    for li, p in enumerate(moduli):
        assert p < (1 << 30), "moduli must be < 2^30 for Shoup/lazy arithmetic"
        if negacyclic:
            assert (p - 1) % (2 * m) == 0, "p must be ≡ 1 mod 2m for negacyclic NTT"
            psi = pr.root_of_unity(2 * m, p)
            assert pow(psi, m, p) == p - 1
            omega = psi * psi % p
        else:
            assert (p - 1) % m == 0, "p must be ≡ 1 mod m for cyclic NTT"
            psi = 1
            omega = pr.root_of_unity(m, p)
        inv_omega = pr.inv_mod(omega, p)
        inv_psi = pr.inv_mod(psi, p)
        inv_m = pr.inv_mod(m, p)

        # Forward DIF stage s operates on blocks of length m>>s with root
        # omega^(2^s); twiddles w^j for j < half.
        for s in range(stages):
            half = m >> (s + 1)
            w = pow(omega, 1 << s, p)
            vals = np.empty(half, dtype=np.uint32)
            cur = 1
            for j in range(half):
                vals[j] = cur
                cur = cur * w % p
            fwd_stage_vals[s][li] = vals

        # Inverse DIT stage with half-length h = 1<<s mirrors forward stage
        # (stages-1-s); twiddles w^{-j}.
        for s in range(stages):
            h = 1 << s
            w = pow(inv_omega, m // (2 * h), p)
            vals = np.empty(h, dtype=np.uint32)
            cur = 1
            for j in range(h):
                vals[j] = cur
                cur = cur * w % p
            inv_stage_vals[s][li] = vals

        cur = 1
        for i in range(m):
            pre[li, i] = cur
            cur = cur * psi % p
        cur = inv_m
        for i in range(m):
            post[li, i] = cur
            cur = cur * inv_psi % p
        cur = 1
        for k in range(2 * m):
            psi_pow[li, k] = cur
            cur = cur * psi % p

    nbits = (2 * m).bit_length() - 1  # exponents live in [0, 2m)
    mono_pow = np.zeros((nbits, L, m), dtype=np.uint32)
    for li, p in enumerate(moduli):
        for b in range(nbits):
            for idx in range(m):
                e = ((2 * int(br[idx]) + 1) << b) % (2 * m)
                mono_pow[b, li, idx] = psi_pow[li, e]

    def shoup_table(vals: np.ndarray) -> np.ndarray:
        out = np.empty_like(vals)
        for li, p in enumerate(moduli):
            out[li] = ((vals[li].astype(np.uint64) << np.uint64(32)) // p).astype(
                np.uint32
            )
        return out

    fwd_tw = tuple(
        (jnp.asarray(v), jnp.asarray(shoup_table(v))) for v in fwd_stage_vals
    )
    inv_tw = tuple(
        (jnp.asarray(v), jnp.asarray(shoup_table(v))) for v in inv_stage_vals
    )
    return NttPlan(
        moduli=tuple(int(p) for p in moduli),
        p=jnp.asarray(p_arr),
        mu=jnp.asarray(mu),
        r_mod_p=jnp.asarray(r_mod_p),
        r_shoup=jnp.asarray(r_shoup),
        fwd_tw=fwd_tw,
        inv_tw=inv_tw,
        pre_tw=jnp.asarray(pre),
        pre_tw_s=jnp.asarray(shoup_table(pre)),
        post_tw=jnp.asarray(post),
        post_tw_s=jnp.asarray(shoup_table(post)),
        mono_pow=jnp.asarray(mono_pow),
        mono_pow_s=jnp.asarray(
            np.stack([shoup_table(mono_pow[b]) for b in range(nbits)])
        ),
    )


def ntt_fwd(plan: NttPlan, x: jax.Array) -> jax.Array:
    """(..., L, m) plain coefficients -> (..., L, m) hat (bit-reversed order)."""
    p = plan.p
    m = plan.length
    x = mm.shoup_mul(x, plan.pre_tw, plan.pre_tw_s, p)
    lead = x.shape[:-1]  # (..., L)
    k = 1
    length = m
    for w, ws in plan.fwd_tw:
        half = length // 2
        xv = x.reshape(lead + (k, length))
        u = xv[..., :half]
        v = xv[..., half:]
        tw = w.reshape(w.shape[0], 1, half)
        tws = ws.reshape(ws.shape[0], 1, half)
        e = mm.addmod(u, v, p[..., None])
        o = mm.shoup_mul(mm.submod(u, v, p[..., None]), tw, tws, p[..., None])
        x = jnp.concatenate([e[..., None, :], o[..., None, :]], axis=-2)
        k *= 2
        length = half
        x = x.reshape(lead + (k * length,))
    return x


def ntt_inv(plan: NttPlan, x: jax.Array) -> jax.Array:
    """(..., L, m) hat (bit-reversed) -> (..., L, m) plain coefficients."""
    p = plan.p
    m = plan.length
    lead = x.shape[:-1]
    k = m
    length = 1
    for w, ws in plan.inv_tw:
        k //= 2
        xv = x.reshape(lead + (k, 2, length))
        a = xv[..., 0, :]
        b = xv[..., 1, :]
        tw = w.reshape(w.shape[0], 1, length)
        tws = ws.reshape(ws.shape[0], 1, length)
        t = mm.shoup_mul(b, tw, tws, p[..., None])
        lo = mm.addmod(a, t, p[..., None])
        hi = mm.submod(a, t, p[..., None])
        x = jnp.concatenate([lo, hi], axis=-1)
        length *= 2
        x = x.reshape(lead + (k * length,))
    return mm.shoup_mul(x, plan.post_tw, plan.post_tw_s, p)


def pointwise_mul(plan: NttPlan, a_hat: jax.Array, b_hat: jax.Array) -> jax.Array:
    """Generic hat-domain product (no precomputed Shoup companion)."""
    return mm.mulmod(a_hat, b_hat, plan.p, plan.mu, plan.r_mod_p, plan.r_shoup)


def polymul(plan: NttPlan, a: jax.Array, b: jax.Array) -> jax.Array:
    """Negacyclic product of (..., L, m) coefficient arrays (setup paths)."""
    return ntt_inv(plan, pointwise_mul(plan, ntt_fwd(plan, a), ntt_fwd(plan, b)))


def monomial_mul_hat(plan: NttPlan, x: jax.Array, u: jax.Array) -> jax.Array:
    """Multiply a hat-domain vector x (..., L, m) by the monomial x^u for a
    traced exponent u (batch dims matching x's leading dims), WITHOUT gathers:
    fold over u's bits with the precomputed ψ-power bit-ladder. ~log2(2m)
    Shoup multiplies + selects — the TPU-friendly form of the reference's
    `mul_by_monomial` in the evaluation domain (src/fhe.jl:554-556)."""
    u = jnp.asarray(u).astype(jnp.uint32)
    nbits = plan.mono_pow.shape[0]
    cond_shape = u.shape + (1, 1)  # broadcast over (L, m)
    for b in range(nbits):
        y = mm.shoup_mul(x, plan.mono_pow[b], plan.mono_pow_s[b], plan.p)
        bit = ((u >> b) & jnp.uint32(1)).astype(jnp.bool_).reshape(cond_shape)
        x = jnp.where(bit, y, x)
    return x


# (A gather-based `monomial_eval` existed here; the bit-ladder
# `monomial_mul_hat` replaced it everywhere — TPU gathers are slow — so it
# was removed rather than kept as untested dead code.)
