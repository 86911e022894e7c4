"""Fused Pallas TPU kernel for the blind-rotation hot loop.

The jnp path in models/bootstrap.py materializes every NTT stage to HBM
(~10 full-array round trips per rotation step); this kernel keeps a tile of
the gate batch resident in VMEM for the FULL n-step rotation (reference
src/fhe.jl:579-582). Two variants:

 - resident: the NTT-domain bootstrap key lives in VMEM for the whole
   rotation (n=64: ~4 MB with Shoup companions).
 - streamed: the key-index axis is a Pallas GRID dimension, so the per-step
   key slice is double-buffered HBM->VMEM; works at any n (Params(512):
   ~600 MB key, ~2.3 MB VMEM footprint).

NTT formulation (2-D tiled, Mosaic-friendly at any m): the coefficient axis
m is laid out as (m1, m2) with m2 = 128 lanes, flat index i = i1*m2 + i2.
The forward transform is the MERGED negacyclic form (see FusedTables): the
butterfly is lo = u + c·v / hi = u − c·v with a block-constant ψ twiddle —
no pre-twist pass, additive lazy-bound growth.

 - Stages with half-width h >= m2 operate along the MAJOR axis m1: these are
   true butterflies via a static reshape m1 -> (g, 2, h1) (h1 = h/m2) — one
   Shoup multiply per PAIR of elements, and the reshape/slicing moves no
   data because the minor (T, m2) dims are untouched.
 - Stages with h < m2 use the roll+select form along the 128-lane minor
   axis: y = x·tw; x' = where(bit_h(i2)==0, x + roll(y, -h), roll(x, h) - y).
   A lane roll never crosses a row because selected positions satisfy
   i2 + h < m2 (bit_h(i2)==0 implies i2 mod 2h < h), so the cyclic wrap
   lands only on masked-out lanes.

This removes the large-roll relayouts that made Mosaic compilation explode
at m >= 4096 in the flat layout (every roll is now either free vreg
renumbering along m1 or a single-vreg lane rotate).

Digit decomposition (ops/rns.py `flatten`), the gadget accumulation, and the
ψ-power monomial bit-ladder (ops/ntt.py `monomial_mul_hat`) are pure
elementwise uint32 ops and fuse into the same kernel.

Equivalent to the jnp path bit-for-bit (deterministic mode); tested in
interpret mode on CPU against models/bootstrap.bootstrap_internal and on
real TPU by bench.py --check (encrypt -> bootstrap -> decrypt truth tables).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath as mm
from .ntt import NttPlan

LANES = 128

# Scoped-VMEM ceiling for the kernels. The Mosaic default (16 MiB) is below
# v5e's physical VMEM; raising it lets the streamed kernel carry a larger
# batch tile (fewer full restreams of the ~600 MB n=512 key from HBM).
# m >= 8192 at tile 16 needs 73.3 MiB of scoped stack (measured, n=1024),
# so those sizes default to 96 MiB (v5e physical VMEM is 128 MiB).
_VMEM_LIMIT_ENV = os.environ.get("SGFHE_VMEM_LIMIT")


def _vmem_limit(m: int) -> int:
    if _VMEM_LIMIT_ENV:
        return int(_VMEM_LIMIT_ENV)
    return (96 if m >= 8192 else 64) * 1024 * 1024


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedTables:
    """Full-width per-stage twiddle tables for the 2-D tiled NTT, plus the
    grouped (radix-4) monomial-ladder tables.

    The FORWARD tables are in the merged negacyclic (Longa–Naehrig) form:
    stage s factors each block modulus z^blen − ψ^F into z^half − ψ^{F/2}
    and z^half − ψ^{F/2+m}, so the butterfly is lo = u + c·v, hi = u − c·v
    with ONE block-constant twiddle c = ψ^{F/2} — no separate ψ^i pre-twist
    pass, and the lazy bound grows additively (+2p per stage) instead of
    doubling, which eliminates almost all in-loop Barrett resets. The hat
    output is bit-identical to pre-twist + DIF (same exact evaluations at
    ψ^{2·br(k)+1} in the same order). fwd_full[s, :, idx] holds the twiddle
    of idx's block at EVERY position (only v-positions are consumed)."""

    fwd_full: jax.Array    # (S, L, m) merged block-constant ψ twiddles
    fwd_full_s: jax.Array  # Shoup companions
    inv_full: jax.Array    # (S, L, m) twiddle at b-positions, 0 elsewhere
    inv_full_s: jax.Array
    # mono4[g, c-1] = ψ^{E * c * 4^g mod 2m} for c in {1,2,3}: the monomial
    # bit ladder processes TWO exponent bits per Shoup multiply (select the
    # table for c = those bits, multiply once) — ~half the ladder multiplies
    # of the per-bit form (ops/ntt.monomial_mul_hat).
    mono4: jax.Array       # (ceil(nbits/2), 3, L, m)
    mono4_s: jax.Array


def build_fused(plan: NttPlan) -> FusedTables:
    """Build the merged-forward twiddle tables (see FusedTables) and spread
    the plan's compact inverse twiddles into full width."""
    from ..utils import primes as pr

    m = plan.length
    L = plan.num_limbs
    S = m.bit_length() - 1
    fwd = np.zeros((S, L, m), dtype=np.uint32)
    fwd_s = np.zeros((S, L, m), dtype=np.uint32)
    inv = np.zeros((S, L, m), dtype=np.uint32)
    inv_s = np.zeros((S, L, m), dtype=np.uint32)
    idx = np.arange(m)
    moduli = [int(x) for x in np.asarray(plan.p).reshape(-1)]
    for li, p in enumerate(moduli):
        # same deterministic 2m-th root as ntt.build_plan
        psi = pr.root_of_unity(2 * m, p)
        assert pow(psi, m, p) == p - 1
        # block-modulus exponent recursion: z^m + 1 == z^m - ψ^m; a block
        # z^blen - ψ^F splits into z^half - ψ^{F/2} (lo) and z^half - ψ^{F/2+m}
        # (hi), butterfly twiddle c = ψ^{F/2}. Layout order == in-place order.
        F = [m]
        for s in range(S):
            blen = m >> s
            block = idx // blen
            cvals = np.array(
                [pow(psi, f // 2, p) for f in F], dtype=np.uint64
            )
            fwd[s, li] = cvals[block].astype(np.uint32)
            fwd_s[s, li] = ((cvals[block] << np.uint64(32)) // p).astype(
                np.uint32
            )
            F = [e for f in F for e in (f // 2, (f // 2 + m) % (2 * m))]
    for s in range(S):
        ln = 1 << s
        b_pos = ((idx >> s) & 1) == 1
        j = idx % ln
        w, ws = (np.asarray(t) for t in plan.inv_tw[s])  # (L, ln)
        inv[s, :, b_pos] = w[:, j[b_pos]].T
        inv_s[s, :, b_pos] = ws[:, j[b_pos]].T
    # grouped ladder tables from the per-bit ψ-power tables: T_c = T1^c mod p
    mono = np.asarray(plan.mono_pow).astype(np.uint64)  # (nbits, L, m)
    p64 = np.asarray(plan.p).astype(np.uint64)          # (L, 1)
    nbits = mono.shape[0]
    G = (nbits + 1) // 2
    mono4 = np.zeros((G, 3, L, m), dtype=np.uint32)
    mono4_s = np.zeros((G, 3, L, m), dtype=np.uint32)
    for g in range(G):
        t1 = mono[2 * g]
        t2 = mono[2 * g + 1] if 2 * g + 1 < nbits else (t1 * t1) % p64
        t3 = (t1 * t2) % p64
        for c, t in enumerate((t1, t2, t3)):
            mono4[g, c] = t.astype(np.uint32)
            mono4_s[g, c] = ((t << np.uint64(32)) // p64).astype(np.uint32)
    return FusedTables(
        fwd_full=jnp.asarray(fwd),
        fwd_full_s=jnp.asarray(fwd_s),
        inv_full=jnp.asarray(inv),
        inv_full_s=jnp.asarray(inv_s),
        mono4=jnp.asarray(mono4),
        mono4_s=jnp.asarray(mono4_s),
    )


def _split_m(m: int) -> tuple[int, int]:
    m2 = min(m, LANES)
    return m // m2, m2


def _roll_minor(x: jax.Array, shift: int) -> jax.Array:
    """Cyclic shift of the last (lane) axis: out[..., i] = x[..., (i-shift) % m2]."""
    m2 = x.shape[-1]
    shift = shift % m2
    if shift == 0:
        return x
    return jnp.concatenate([x[..., m2 - shift:], x[..., :m2 - shift]], axis=-1)


def _lane_mask(h: int, ndim: int, m2: int) -> jax.Array:
    """(..., 1, m2) bool: bit_h of the lane index is 0."""
    i2 = jax.lax.broadcasted_iota(jnp.int32, (1,) * (ndim - 1) + (m2,), ndim - 1)
    return (i2 & jnp.int32(h)) == 0


# ---------------------------------------------------------------------------
# 2-D tiled lazy NTT (Harvey bounds tracked in units of p)
# ---------------------------------------------------------------------------
# Array layout inside kernels: (..., L, m1, T, m2) where (T, m2) are the
# minor sublane x lane dims; the m1 axis is MAJOR so slicing/reshaping it is
# free. Twiddle tables are (S, L, m1, 1, m2), broadcasting over T.

_U32_LIMIT = (1 << 32) - 1


def _chk(c: int, p_max: int) -> int:
    """Static lazy-bound guard: every tracked intermediate bound c (in units
    of p) must satisfy c * p_max <= 2^32 - 1 or uint32 lanes silently wrap.
    Bounds are Python ints, so this trips at TRACE time, never on device —
    the repo invariant that lazy bounds be re-derived whenever kernel
    arithmetic changes (CLAUDE.md) is thereby enforced mechanically."""
    assert c * p_max <= _U32_LIMIT, (
        f"lazy-reduction bound overflow: {c} * p_max ({p_max}) exceeds "
        f"2^32 - 1; the reduction schedule must reset earlier"
    )
    return c


def _ntt_fwd_lazy(x, fwd, fwd_s, p, mu, p_max: int, m1: int, m2: int):
    """Forward negacyclic NTT in the merged (Longa–Naehrig) form: the ψ
    pre-twist is folded into block-constant stage twiddles, the butterfly is
    lo = u + c·v / hi = u − c·v (multiply on the INPUT), so the lazy bound
    grows additively (+2 per stage) instead of doubling. Input canonical,
    output congruent mod p with per-lane bound c*p (returned multiplier c).
    x: (..., m1, T, m2)."""
    m = m1 * m2
    c = 1
    S = m.bit_length() - 1
    ax1 = x.ndim - 3  # the m1 axis
    for s in range(S):
        h = m >> (s + 1)
        if (c + 2) * p_max > _U32_LIMIT:
            x = mm.mod_u32(x, p, mu)
            c = 1
        _chk(c + 2, p_max)  # u + y and u + 2p - y are both < (c+2)*p
        if h >= m2:
            # true butterfly along m1: reshape m1 -> (g, 2, h1). The reshape
            # adds one axis before (h1, T, m2), so per-limb constants need an
            # extra broadcast dim: p5 aligns L with L, not with g.
            h1 = h // m2
            g = m1 // (2 * h1)
            p5 = p[:, None]
            xv = x.reshape(x.shape[:ax1] + (g, 2, h1) + x.shape[ax1 + 1:])
            u = xv[..., :, 0, :, :, :]
            v = xv[..., :, 1, :, :, :]
            # ONE twiddle per block: collapse the full-width table to the
            # (L, g, 1, 1, 1) block constants (free: major-axis reshape+slice)
            L_ = fwd.shape[1]
            tw = fwd[s].reshape(L_, g, 2 * h1, 1, m2)[:, :, :1, :, :1]
            tws = fwd_s[s].reshape(L_, g, 2 * h1, 1, m2)[:, :, :1, :, :1]
            y = mm.shoup_mul_lazy(v, tw, tws, p5)          # < 2p
            lo = u + y                                     # < (c+2) p
            hi = u + jnp.uint32(2) * p5 - y                # < (c+2) p
            x = jnp.concatenate(
                [lo[..., :, None, :, :, :], hi[..., :, None, :, :, :]],
                axis=ax1 + 1,
            ).reshape(x.shape)
        else:
            # lane stage: roll+select along the 128-lane minor axis
            y = mm.shoup_mul_lazy(x, fwd[s], fwd_s[s], p)  # < 2p (v-pos used)
            lo = x + _roll_minor(y, -h)                    # u + c·v
            hi = _roll_minor(x, h) + jnp.uint32(2) * p - y  # u - c·v
            x = jnp.where(_lane_mask(h, x.ndim, m2), lo, hi)
        c = c + 2
    return x, c


def _ntt_inv_lazy(x, post, post_s, inv, inv_s, p, mu, c_in: int,
                  p_max: int, m1: int, m2: int):
    """Inverse NTT (hat -> coefficients); input bound c_in*p, output CANONICAL
    (< p). x: (..., m1, T, m2)."""
    m = m1 * m2
    S = m.bit_length() - 1
    c = c_in
    ax1 = x.ndim - 3
    for s in range(S):
        h = 1 << s
        if (c + 2) * p_max > _U32_LIMIT:
            x = mm.mod_u32(x, p, mu)
            c = 1
        _chk(c + 2, p_max)  # lo = a + t and a + 2p - t are both < (c+2)*p
        if h >= m2:
            h1 = h // m2
            g = m1 // (2 * h1)
            p5 = p[:, None]
            xv = x.reshape(x.shape[:ax1] + (g, 2, h1) + x.shape[ax1 + 1:])
            a = xv[..., :, 0, :, :, :]
            b = xv[..., :, 1, :, :, :]
            tw = inv[s, ..., h1:2 * h1, :, :][:, None]
            tws = inv_s[s, ..., h1:2 * h1, :, :][:, None]
            t = mm.shoup_mul_lazy(b, tw, tws, p5)          # < 2p
            lo = a + t                                     # < (c+2) p
            hi = a + jnp.uint32(2) * p5 - t                # < (c+2) p
            x = jnp.concatenate(
                [lo[..., :, None, :, :, :], hi[..., :, None, :, :, :]],
                axis=ax1 + 1,
            ).reshape(x.shape)
        else:
            y = mm.shoup_mul_lazy(x, inv[s], inv_s[s], p)  # < 2p
            lo = x + _roll_minor(y, -h)                    # < (c+2) p
            hi = _roll_minor(x, h) + jnp.uint32(2) * p - y
            x = jnp.where(_lane_mask(h, x.ndim, m2), lo, hi)
        c = c + 2
    x = mm.shoup_mul_lazy(x, post, post_s, p)              # < 2p
    return jnp.where(x >= p, x - p, x)


def _flatten_rand_k(x, p, mu, inv_pj_val, inv_pj_shoup, s_mod, offset,
                    L: int, moduli: tuple, rnd, prune: int = 0):
    """In-kernel RANDOMIZED flatten (mirrors ops/rns.flatten_random): mask
    each digit with an exactly-uniform draw from [-2^k, 2^k) (2^k >= 3*s_i,
    ops/rns.mask_window_bits), deterministically flatten the unmasked
    remainder, and add the masks back. Digit bound (-4p_i, 4p_i) — see
    mask_window_bits for why that is within the reference's noise posture
    (src/utils.jl:198-241).

    rnd = ((seed_lo, seed_hi), step_k, op_id, gate_offset): masks are drawn
    from the documented Threefry-2x32 counter stream over the GLOBAL (gate,
    coefficient, step, operand, digit) coordinates (ops/prg.py;
    ops/rns.mask_words is the shared implementation), so the stream is
    bit-identical on every backend, for every batch-tile size, AND to the
    jnp path — a cryptographic ARX cipher, beating the reference's
    MersenneTwister-with-SHAKE-TODO posture (src/utils.jl:63-68)."""
    from .rns import mask_window_bits, mask_words

    (seed_lo, seed_hi), step_k, op_id, gate_off = rnd
    m1_, T_, m2_ = x.shape[1:]
    i1 = jax.lax.broadcasted_iota(jnp.uint32, (m1_, T_, m2_), 0)
    it = jax.lax.broadcasted_iota(jnp.uint32, (m1_, T_, m2_), 1) + gate_off
    i2 = jax.lax.broadcasted_iota(jnp.uint32, (m1_, T_, m2_), 2)
    # unique element counter per (global gate, coefficient): gate*m + coeff
    ctr = (it * np.uint32(m1_) + i1) * np.uint32(m2_) + i2
    seed2 = (seed_lo.astype(jnp.uint32), seed_hi.astype(jnp.uint32))
    words = mask_words(seed2, ctr, step_k, op_id, L)

    masks = []
    rand_x = x
    # pruned digits are never output -> no privacy mask (mirrors
    # ops/rns.flatten_random: word i still addresses digit i)
    for i in range(prune, L):
        w_int = 1  # gadget weight w_i = prod_{j<i} p_j as a Python int
        for j in range(i):
            w_int *= moduli[j]
        k_bits = mask_window_bits(moduli[i])
        v = words[i] & np.uint32((1 << (k_bits + 1)) - 1)
        # embed (v - 2^k) into every limb, and subtract mask_i * w_i from
        # rand_x. Per-limb SCALAR constants only — Pallas bodies may not
        # capture numpy arrays.
        e_limbs = []
        contrib_limbs = []
        for kq, q in enumerate(moduli):
            pk = np.uint32(q)
            muk = np.uint32(mm.barrett_mu(q))
            ek = mm.mod_u32(v, pk, muk)
            ek = mm.submod(ek, np.uint32((1 << k_bits) % q), pk)
            e_limbs.append(ek)
            wv = np.uint32(w_int % q)
            wsh = np.uint32(mm.shoup_const(int(wv), q))
            contrib_limbs.append(mm.shoup_mul(ek, wv, wsh, pk))
        e = jnp.stack(e_limbs)                     # (L, m1, T, m2)
        masks.append(e)
        rand_x = mm.submod(rand_x, jnp.stack(contrib_limbs), p)
    digs = _flatten_k(rand_x, p, mu, inv_pj_val, inv_pj_shoup, s_mod, offset,
                      L, moduli, prune)
    return [mm.addmod(d, mk, p) for d, mk in zip(digs, masks)]


def _flatten_k(x, p, mu, inv_pj_val, inv_pj_shoup, s_mod, offset, L: int,
               moduli: tuple, prune: int = 0):
    """In-kernel mixed-radix balanced flatten (mirrors ops/rns.flatten) in the
    limb-major layout: x (L, m1, T, m2) -> list of L digits, each (L, m1, T,
    m2). p, mu, offset: (L, 1, 1, 1); s_mod: (L, L, 1, 1, 1); inv tables
    (L, L) scalars.

    `moduli` is REQUIRED (round-3 advisor finding: a defaulted () silently
    fell back to the slower Barrett path) and must be the same prime set the
    p/mu device arrays encode — the dispatchers assert that against the
    plan's static moduli (`_common_operands`). The fast path: when every pair
    of RNS primes is within 2x of each other (utils.primes.close_primes —
    true for all Params, one narrow search window), a value canonical mod p_j
    is < 2*p_i, so cross-limb re-reductions need only a single conditional
    subtract instead of a full Barrett reduction (exact either way, so
    bit-identical)."""
    from ..utils import primes as _pr

    assert len(moduli) == L, f"moduli {moduli} inconsistent with L={L}"
    close = _pr.close_primes(moduli)
    y = mm.addmod(x, offset, p)
    digits = []
    for i in range(L):
        t = y[i]  # (m1, T, m2)
        pi = p[i]
        for j in range(i):
            dj = digits[j]  # canonical mod p_j
            if close:
                dj = jnp.where(dj >= pi, dj - pi, dj)
            else:
                dj = mm.mod_u32(dj, pi, mu[i])
            t = mm.submod(t, dj, pi)
            t = mm.shoup_mul(t, inv_pj_val[i, j], inv_pj_shoup[i, j], pi)
        digits.append(t)
    out = []
    for i in range(prune, L):  # pruned digits: extracted (chain needs them
        d = digits[i][None]    # to peel) but never embedded/returned
        if close:
            e = jnp.where(d >= p, d - p, d)  # (L, m1, T, m2)
        else:
            e = mm.mod_u32(d, p, mu)
        e = mm.submod(e, s_mod[i], p)
        out.append(e)
    return out


def _rotate_body(
    a_acc, b_acc, t_a, t_b, ck, cks, u_k,
    post, post_s, fwd, fwd_s, inv, inv_s, mono, mono_s,
    p, mu, ipj, ipj_s, smod, off,
    *, l: int, L: int, m1: int, m2: int, p_max: int,
    randomized: bool = False, moduli: tuple = (), rnd=None,
    wval=None, wshoup=None, prune: int = 0,
):
    """One blind-rotation step on a batch tile.

    a_acc, b_acc: (L, m1, T, m2) canonical residues; t_a, t_b: the hat-domain
    accumulators (canonical) — NTT(a_acc)/NTT(b_acc). Because the gadget
    identity sum_i w_i * digit_i == x holds mod every limb, the gadget
    T-term of the external product IS the hat of the pre-flatten accumulator
    (for the randomized flatten too: the masks cancel, mask_i*w_i was
    subtracted before flattening). Carrying it from the previous step's
    `val` replaces 2l w-multiplies per step with zero work — a win for the
    VMEM-resident kernel; the streamed kernel instead passes t_a=t_b=None
    with wval/wshoup tables and computes T by w-multiplies (measured: the
    extra carried state costs it more than the multiplies, v5e n=512).

    ck/cks: (2l, 2, L, m1, m2) key slice; u_k: (T, 1) exponents.
    randomized=True uses the counter-hash PRNG masks; rnd = ((seed_lo,
    seed_hi), step_k, gate_offset) identifies the stream (64-bit key).

    Returns (a_acc', b_acc', t_a', t_b'), all canonical.
    """
    lk = l - prune  # kept digits per operand (approximate gadget: the
    # `prune` lowest mixed-radix rows are dropped; see models/params.
    # prune_error_bound for the admitted noise). Key row for kept-digit row
    # r is (prune + r) within each operand's l-row block.
    assert 0 <= prune < l
    assert prune == 0 or t_a is None, (
        "hat-carry T-term represents the UNpruned accumulator; pruned mode "
        "must compute T over the kept digits (wval path)"
    )
    if randomized:
        seed, step_k, gate_off = rnd
        da = _flatten_rand_k(a_acc, p, mu, ipj, ipj_s, smod, off, L, moduli,
                             (seed, step_k, 0, gate_off), prune)
        db = _flatten_rand_k(b_acc, p, mu, ipj, ipj_s, smod, off, L, moduli,
                             (seed, step_k, 1, gate_off), prune)
    else:
        da = _flatten_k(a_acc, p, mu, ipj, ipj_s, smod, off, L, moduli, prune)
        db = _flatten_k(b_acc, p, mu, ipj, ipj_s, smod, off, L, moduli, prune)
    digits = jnp.stack(da + db, axis=0)  # (2lk, L, m1, T, m2)
    d_hat, _ = _ntt_fwd_lazy(digits, fwd, fwd_s, p, mu, p_max, m1, m2)

    outs = []
    t_outs = []
    for c, t_carry in ((0, t_a), (1, t_b)):
        # lazy accumulation: each Shoup product < 2p; reduce the running sum
        # whenever the tracked bound would overflow uint32 (this fires at
        # l = 3 with ~29-bit limbs, where 12*p_max > 2^32 — Params(1024))
        s_acc, cs = None, 0
        for row in range(2 * lk):
            krow = prune + row if row < lk else l + prune + (row - lk)
            prod = mm.shoup_mul_lazy(
                d_hat[row], ck[krow, c][:, :, None, :],
                cks[krow, c][:, :, None, :],
                p,
            )
            if s_acc is None:
                s_acc, cs = prod, 2
            else:
                if (cs + 2) * p_max > _U32_LIMIT:
                    s_acc = mm.mod_u32(s_acc, p, mu)
                    cs = 1
                s_acc = s_acc + prod
                cs = _chk(cs + 2, p_max)
        if t_carry is not None:
            t_acc, ct = t_carry, 1  # canonical hat carried from last step
        else:
            t_acc, ct = None, 0
            for i in range(lk):
                row = i if c == 0 else lk + i
                wprod = mm.shoup_mul_lazy(
                    d_hat[row], wval[prune + i], wshoup[prune + i], p
                )
                if t_acc is None:
                    t_acc, ct = wprod, 2
                else:
                    if (ct + 2) * p_max > _U32_LIMIT:
                        t_acc = mm.mod_u32(t_acc, p, mu)
                        ct = 1
                    t_acc = t_acc + wprod
                    ct = _chk(ct + 2, p_max)
        # val = rot + (cs*p - s_acc) + t_acc needs (cs + max(cs,2) + ct)*p
        # to fit uint32: the ladder's MULTIPLIED lanes land in [0, 2p), so
        # its output bound is max(cs, 2)*p — NOT cs*p when cs == 1 after a
        # Barrett reset (the round-2 advisor finding: 2*cs + ct understated
        # the true bound by p in exactly that case).
        if (cs + max(cs, 2) + ct) * p_max > _U32_LIMIT:
            s_acc = mm.mod_u32(s_acc, p, mu)
            cs = 1
            if ct > 1:
                t_acc = mm.mod_u32(t_acc, p, mu)
                ct = 1
        # grouped monomial ladder: rot = x^{u_k} * s_acc, TWO exponent bits
        # per Shoup multiply (select among ψ^{E·c·4^g}, c in {1,2,3})
        nbits = (2 * m1 * m2).bit_length() - 1
        rot = s_acc
        for g in range(mono.shape[0]):
            shift = 2 * g
            width = min(2, nbits - shift)
            cg = ((u_k >> shift) & jnp.uint32((1 << width) - 1))[None, None]
            if width == 2:
                selv = jnp.where(
                    cg == 1, mono[g, 0],
                    jnp.where(cg == 2, mono[g, 1], mono[g, 2]),
                )
                sels = jnp.where(
                    cg == 1, mono_s[g, 0],
                    jnp.where(cg == 2, mono_s[g, 1], mono_s[g, 2]),
                )
            else:
                selv, sels = mono[g, 0], mono_s[g, 0]
            y = mm.shoup_mul_lazy(rot, selv, sels, p)
            rot = jnp.where(cg == 0, rot, y)  # (1,1,T,1) vs (L,m1,T,m2)
        cr = max(cs, 2)  # ladder output bound (multiplied lanes < 2p)
        # val = rot - s_acc + t_acc, kept nonnegative via +cs*p
        _chk(cs + cr + ct, p_max)
        val = rot + (jnp.uint32(cs) * p - s_acc) + t_acc
        if t_carry is not None:
            # canonical copy becomes the next step's T-term
            val = mm.mod_u32(val, p, mu)
            t_outs.append(val)
            c_in = 1
        else:
            t_outs.append(None)
            c_in = cs + cr + ct
        outs.append(
            _ntt_inv_lazy(val, post, post_s, inv, inv_s, p, mu,
                          c_in, p_max, m1, m2)
        )
    return outs[0], outs[1], t_outs[0], t_outs[1]


def _rotate_kernel(
    # inputs (order matters — must match pallas_call operands)
    ua_ref, a0_ref, b0_ref, bk_ref, bks_ref,
    post_ref, post_s_ref,
    fwd_ref, fwd_s_ref, inv_ref, inv_s_ref,
    mono_ref, mono_s_ref,
    p_ref, mu_ref, ipj_ref, ipj_s_ref, smod_ref, off_ref,
    wval_ref, wshoup_ref, seed_ref,
    # outputs
    a_out_ref, b_out_ref,
    *, n: int, l: int, L: int, m1: int, m2: int, p_max: int,
    randomized: bool = False, moduli: tuple = (), prune: int = 0,
):
    """Resident kernel: whole bootstrap key in VMEM, fori_loop over steps.

    prune > 0 (approximate gadget) computes the T-term by w-multiplies over
    the kept digits instead of the hat-carry (which represents the UNpruned
    accumulator)."""
    tile = a0_ref.shape[2]
    gate_off = (pl.program_id(0) * jnp.int32(tile)).astype(jnp.uint32)
    seed = (seed_ref[0, 0], seed_ref[0, 1])
    p = p_ref[:]          # (L, 1, 1, 1)
    mu = mu_ref[:]
    consts = dict(
        post=post_ref[:],
        post_s=post_s_ref[:], fwd=fwd_ref[:], fwd_s=fwd_s_ref[:],
        inv=inv_ref[:], inv_s=inv_s_ref[:], mono=mono_ref[:],
        mono_s=mono_s_ref[:], p=p, mu=mu, ipj=ipj_ref[:], ipj_s=ipj_s_ref[:],
        smod=smod_ref[:], off=off_ref[:],
    )
    if prune:
        consts["wval"] = wval_ref[:]
        consts["wshoup"] = wshoup_ref[:]

    def hat_of(x):  # canonical hat of a coefficient-domain accumulator
        h, _ = _ntt_fwd_lazy(
            x, consts["fwd"], consts["fwd_s"], p, mu, p_max, m1, m2,
        )
        return mm.mod_u32(h, p, mu)

    def step(k, carry):
        a_acc, b_acc, t_a, t_b = carry
        ck = bk_ref[pl.ds(k, 1)][0]    # (2l, 2, L, m1, m2)
        cks = bks_ref[pl.ds(k, 1)][0]
        u_k = ua_ref[pl.ds(k, 1)][0]   # (T, 1)
        return _rotate_body(
            a_acc, b_acc, t_a, t_b, ck, cks, u_k, **consts,
            l=l, L=L, m1=m1, m2=m2, p_max=p_max,
            randomized=randomized, moduli=moduli, prune=prune,
            rnd=(seed, k, gate_off),
        )

    a0 = a0_ref[:]
    b0 = b0_ref[:]
    init_t = (None, None) if prune else (hat_of(a0), hat_of(b0))
    a_acc, b_acc, _, _ = jax.lax.fori_loop(
        0, n, step, (a0, b0) + init_t
    )
    a_out_ref[:] = a_acc
    b_out_ref[:] = b_acc


def _rotate_step_kernel(
    # inputs
    ua_ref, a0_ref, b0_ref, bk_ref, bks_ref,
    post_ref, post_s_ref,
    fwd_ref, fwd_s_ref, inv_ref, inv_s_ref,
    mono_ref, mono_s_ref,
    p_ref, mu_ref, ipj_ref, ipj_s_ref, smod_ref, off_ref,
    wval_ref, wshoup_ref, seed_ref,
    # outputs
    a_out_ref, b_out_ref,
    # VMEM scratch: the accumulators persist across the k grid axis — no
    # HBM writeback until the last step
    a_s, b_s,
    *, n: int, l: int, L: int, m1: int, m2: int, p_max: int,
    randomized: bool = False, moduli: tuple = (), prune: int = 0,
):
    """One blind-rotation step per grid point (t, k): the key-index axis k is
    a GRID dimension, so Pallas streams the (1, 2l, 2, L, m1, m2) bootstrap-
    key slice for step k from HBM into VMEM with automatic double-buffering —
    this is how n=512 (≈600 MB key) runs with a ~2.3 MB VMEM key footprint.
    The accumulators live in VMEM scratch for all n steps of a tile; the
    output blocks are written once, at k == n-1. Computes the gadget T-term
    by w-multiplies (the hat-carry variant measured slower here — see
    _rotate_body)."""
    k = pl.program_id(1)
    tile = a0_ref.shape[2]
    gate_off = (pl.program_id(0) * jnp.int32(tile)).astype(jnp.uint32)
    p = p_ref[:]
    mu = mu_ref[:]

    @pl.when(k == 0)
    def _init():
        a_s[:] = a0_ref[:]
        b_s[:] = b0_ref[:]

    a_acc, b_acc, _, _ = _rotate_body(
        a_s[:], b_s[:], None, None,
        bk_ref[0], bks_ref[0], ua_ref[0],
        post_ref[:], post_s_ref[:],
        fwd_ref[:], fwd_s_ref[:], inv_ref[:], inv_s_ref[:],
        mono_ref[:], mono_s_ref[:],
        p, mu, ipj_ref[:], ipj_s_ref[:], smod_ref[:], off_ref[:],
        l=l, L=L, m1=m1, m2=m2, p_max=p_max,
        randomized=randomized, moduli=moduli, prune=prune,
        rnd=((seed_ref[0, 0], seed_ref[0, 1]), k, gate_off),
        wval=wval_ref[:], wshoup=wshoup_ref[:],
    )
    a_s[:] = a_acc
    b_s[:] = b_acc

    @pl.when(k == n - 1)
    def _finish():
        a_out_ref[:] = a_acc
        b_out_ref[:] = b_acc


def _tile_env() -> int | None:
    """SGFHE_TILE override, read at call time and validated."""
    v = os.environ.get("SGFHE_TILE")
    if not v:
        return None
    try:
        t = int(v)
    except ValueError as e:
        raise ValueError(f"SGFHE_TILE must be an integer, got {v!r}") from e
    if t < 8 or t % 8 != 0:
        raise ValueError(
            f"SGFHE_TILE must be a positive multiple of 8 (sublane tiling), "
            f"got {t}"
        )
    return t


def _auto_tile(params, default: int, *, streamed: bool) -> int:
    """Batch-tile size. The per-tile VMEM working set (digits + d_hat +
    accumulators + mulhilo temporaries, ~20 arrays of (L, tile, m) u32) must
    stay under the scoped-VMEM limit alongside the resident tables; the
    resident kernel also holds the whole key (fused_bkey_vmem_bytes), so it
    gets a tighter cap. Measured on v5e at n=512 (L=3, m=4096): tile 8/16/32
    -> 169/180/187 gates/s but 59s/156s/963s Mosaic compile — tile=16 is the
    sweet spot (SGFHE_TILE overrides). At n=64 the resident kernel's tile=32
    is within 1% of 64 and always fits."""
    env = _tile_env()
    if env is not None:
        return env
    L, m = params.num_limbs, params.m
    # streamed budget 32 MiB: at m=8192/L=3 this yields tile 16 (measured
    # +10% over tile 8 at n=1024: 45.8 vs 41.5 gates/s; needs the 96 MiB
    # scoped limit above) while m=16384/L=4 stays at tile 8 and n=512 is
    # still capped by `default` at its measured sweet spot 16.
    budget = 32 * 1024 * 1024 if streamed else 4 * 1024 * 1024
    cap = budget // (16 * L * m * 4)
    t = 8
    while t * 2 <= min(default, max(8, cap)):
        t *= 2
    return t


def _common_operands(params, ctx):
    """Reshape plan/rns tables to the kernel's (…, m1, 1, m2) layout."""
    L, m = params.num_limbs, params.m
    m1, m2 = _split_m(m)
    plan = ctx.plan_Q
    rns = ctx.rns
    ft = ctx.fused
    # trace-time consistency guard (round-3 advisor): the static moduli the
    # kernels specialize on (close-prime path, mask windows, lazy bounds)
    # must be the exact prime set the device tables were built from.
    assert plan.moduli == tuple(params.moduli), (
        f"params.moduli {params.moduli} != plan moduli {plan.moduli}: "
        f"ctx was built from different Params"
    )

    def tw2(t):  # (L, m) -> (L, m1, 1, m2)
        return t.reshape(L, m1, 1, m2)

    def tws2(t):  # (S/nbits, L, m) -> (S, L, m1, 1, m2)
        return t.reshape(t.shape[0], L, m1, 1, m2)

    return (
        tw2(plan.post_tw), tw2(plan.post_tw_s),
        tws2(ft.fwd_full), tws2(ft.fwd_full_s),
        tws2(ft.inv_full), tws2(ft.inv_full_s),
        ft.mono4.reshape(ft.mono4.shape[0], 3, L, m1, 1, m2),
        ft.mono4_s.reshape(ft.mono4.shape[0], 3, L, m1, 1, m2),
        plan.p[:, :, None, None], plan.mu[:, :, None, None],
        rns.inv_pj_val, rns.inv_pj_shoup,
        rns.s_mod[:, :, :, None, None], rns.offset[:, :, None, None],
    )


def _to_kernel_layout(x, L, m1, m2):
    """(B, L, m) -> (L, m1, B, m2)."""
    B = x.shape[0]
    return jnp.transpose(x.reshape(B, L, m1, m2), (1, 2, 0, 3))


def _from_kernel_layout(x, L, m1, m2):
    """(L, m1, B, m2) -> (B, L, m)."""
    B = x.shape[2]
    return jnp.transpose(x, (2, 0, 1, 3)).reshape(B, L, m1 * m2)


def _pad_batch(tile, ua, a0, b0):
    B = ua.shape[0]
    padded = ((B + tile - 1) // tile) * tile
    if padded != B:
        padB = padded - B
        ua = jnp.pad(ua, ((0, padB), (0, 0)))
        a0 = jnp.pad(a0, ((0, padB), (0, 0), (0, 0)))
        b0 = jnp.pad(b0, ((0, padB), (0, 0), (0, 0)))
    return padded, ua, a0, b0


def blind_rotate_fused(
    params, ctx, bkey_hat, bkey_shoup, ua, a0, b0, *,
    tile: int | None = None, interpret: bool = False, seed=None,
    prune: int = 0,
):
    """Full n-step blind rotation, bootstrap key VMEM-resident (grid over
    batch tiles only). ua: (B, n) mod-r exponents; a0, b0: (B, L, m).
    seed: optional (1, 2) int32 (two key words) — enables randomized
    flattening with in-kernel PRNG masks. prune: approximate-gadget digit
    pruning (drop the `prune` lowest digit rows — models/params.
    prune_error_bound documents the admitted noise).
    Returns (a_acc, b_acc) of shape (B, L, m)."""
    n, l, L, m = params.n, params.num_digits, params.num_limbs, params.m
    m1, m2 = _split_m(m)
    B = ua.shape[0]
    if tile is None:
        tile = _auto_tile(params, 64, streamed=False)
    tile = min(tile, max(8, B))
    padded, ua, a0, b0 = _pad_batch(tile, ua, a0, b0)
    grid = (padded // tile,)

    def acc_spec():
        return pl.BlockSpec(
            (L, m1, tile, m2), lambda t: (0, 0, t, 0), memory_space=pltpu.VMEM
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    randomized = seed is not None
    if seed is None:
        seed = jnp.zeros((1, 2), jnp.int32)
    p_max = max(params.moduli)
    kernel = partial(_rotate_kernel, n=n, l=l, L=L, m1=m1, m2=m2,
                     p_max=p_max, randomized=randomized, moduli=params.moduli,
                     prune=prune)
    out_shape = [
        jax.ShapeDtypeStruct((L, m1, padded, m2), jnp.uint32),
        jax.ShapeDtypeStruct((L, m1, padded, m2), jnp.uint32),
    ]
    in_specs = [
        pl.BlockSpec(
            (n, tile, 1), lambda t: (0, t, 0), memory_space=pltpu.VMEM
        ),              # ua (n, B, 1): step exponents
        acc_spec(),     # a0
        acc_spec(),     # b0
        full(),         # bkey (resident)
        full(),
    ] + [full()] * 16 + [
        pl.BlockSpec((1, 2), lambda t: (0, 0), memory_space=pltpu.SMEM)
    ]
    out_specs = [acc_spec(), acc_spec()]

    a_lm, b_lm = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit(m)),
    )(
        ua.T[:, :, None],
        _to_kernel_layout(a0, L, m1, m2),
        _to_kernel_layout(b0, L, m1, m2),
        bkey_hat.reshape(n, 2 * l, 2, L, m1, m2),
        bkey_shoup.reshape(n, 2 * l, 2, L, m1, m2),
        *_common_operands(params, ctx),
        ctx.rns.w_val[:, :, :, None, None],
        ctx.rns.w_shoup[:, :, :, None, None],
        seed,
    )
    a_acc = _from_kernel_layout(a_lm, L, m1, m2)
    b_acc = _from_kernel_layout(b_lm, L, m1, m2)
    if padded != B:
        a_acc = a_acc[:B]
        b_acc = b_acc[:B]
    return a_acc, b_acc


def blind_rotate_streamed(
    params, ctx, bkey_hat, bkey_shoup, ua, a0, b0, *,
    tile: int | None = None, interpret: bool = False, seed=None,
    prune: int = 0,
):
    """Blind rotation with the bootstrap key STREAMED from HBM (grid axis over
    key steps, Pallas double-buffers the per-step slice). Works at any n.
    seed: optional (1, 2) int32 (two key words) — enables in-kernel
    randomized flattening. prune: approximate-gadget digit pruning."""
    n, l, L, m = params.n, params.num_digits, params.num_limbs, params.m
    m1, m2 = _split_m(m)
    B = ua.shape[0]
    if tile is None:
        tile = _auto_tile(params, 16, streamed=True)
    tile = min(tile, max(8, B))
    padded, ua, a0, b0 = _pad_batch(tile, ua, a0, b0)
    num_tiles = padded // tile

    def acc_spec():
        return pl.BlockSpec(
            (L, m1, tile, m2), lambda t, k: (0, 0, t, 0),
            memory_space=pltpu.VMEM,
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    randomized = seed is not None
    if seed is None:
        seed = jnp.zeros((1, 2), jnp.int32)
    p_max = max(params.moduli)
    kernel = partial(
        _rotate_step_kernel, n=n, l=l, L=L, m1=m1, m2=m2, p_max=p_max,
        randomized=randomized, moduli=params.moduli, prune=prune,
    )
    out_shape = [
        jax.ShapeDtypeStruct((L, m1, padded, m2), jnp.uint32),
        jax.ShapeDtypeStruct((L, m1, padded, m2), jnp.uint32),
    ]
    in_specs = [
        pl.BlockSpec(
            (1, tile, 1), lambda t, k: (k, t, 0), memory_space=pltpu.VMEM
        ),              # ua (n, B, 1): step exponents
        acc_spec(),     # a0
        acc_spec(),     # b0
        pl.BlockSpec(
            (1, 2 * l, 2, L, m1, m2), lambda t, k: (k, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),              # bkey slice for step k (streamed)
        pl.BlockSpec(
            (1, 2 * l, 2, L, m1, m2), lambda t, k: (k, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ] + [full()] * 16 + [
        pl.BlockSpec((1, 2), lambda t, k: (0, 0), memory_space=pltpu.SMEM)
    ]
    out_specs = [acc_spec(), acc_spec()]
    scratch = [
        pltpu.VMEM((L, m1, tile, m2), jnp.uint32) for _ in range(2)
    ]

    a_lm, b_lm = pl.pallas_call(
        kernel,
        grid=(num_tiles, n),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_vmem_limit(m),
        ),
    )(
        ua.T[:, :, None],
        _to_kernel_layout(a0, L, m1, m2),
        _to_kernel_layout(b0, L, m1, m2),
        bkey_hat.reshape(n, 2 * l, 2, L, m1, m2),
        bkey_shoup.reshape(n, 2 * l, 2, L, m1, m2),
        *_common_operands(params, ctx),
        ctx.rns.w_val[:, :, :, None, None],
        ctx.rns.w_shoup[:, :, :, None, None],
        seed,
    )
    a_acc = _from_kernel_layout(a_lm, L, m1, m2)
    b_acc = _from_kernel_layout(b_lm, L, m1, m2)
    if padded != B:
        a_acc = a_acc[:B]
        b_acc = b_acc[:B]
    return a_acc, b_acc


def fused_bkey_vmem_bytes(params) -> int:
    """VMEM footprint of the resident bootstrap key (values + Shoup)."""
    n, l, L, m = params.n, params.num_digits, params.num_limbs, params.m
    return 2 * n * (2 * l) * 2 * L * m * 4
