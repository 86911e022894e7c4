"""Fused Pallas TPU kernel for the blind-rotation hot loop.

The jnp path in models/bootstrap.py materializes every NTT stage to HBM
(~10 full-array round trips per rotation step); at Params(64) that makes the
gate bootstrap HBM-bandwidth-bound. This kernel keeps a tile of the gate
batch resident in VMEM for the FULL n-step rotation (reference
src/fhe.jl:579-582), with the NTT-domain bootstrap key also VMEM-resident
(n=64: ~4 MB with Shoup companions), so HBM sees only the initial
accumulators in and the final accumulators out.

NTT formulation (kernel-friendly, no reshapes): each radix-2 stage is a
static-shift rotate + masked select —

    fwd DIF stage, half h:  x' = where(bit_h(idx)==0,
                                       x + roll(x, -h),          # e = u+v
                                       (roll(x, h) - x) * tw)    # o = (u-v)w^j
    inv DIT stage, len  h:  y  = x * tw  (tw = w^{-j} at b-positions)
                            x' = where(bit_h(idx)==0,
                                       x + roll(y, -h),          # a + t
                                       roll(x, h) - y)           # a - t

where roll is a cyclic shift of the coefficient axis implemented as two
static slices + concat (Mosaic-native). The wrapped-in positions are exactly
the masked-out ones, so cyclic wrap is harmless. Twiddle tables are stored
full-width per stage ((S, L, m), value+Shoup), masked positions hold 0.

Digit decomposition (ops/rns.py `flatten`), the gadget accumulation, and the
ψ-power monomial bit-ladder (ops/ntt.py `monomial_mul_hat`) are pure
elementwise uint32 ops and fuse into the same kernel.

Equivalent to the jnp path bit-for-bit (deterministic mode); tested in
interpret mode on CPU against models/bootstrap.bootstrap_internal.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modmath as mm
from .ntt import NttPlan


def _roll(x: jax.Array, shift: int) -> jax.Array:
    """Cyclic right-shift of the last axis by a STATIC amount: out[i] =
    x[(i - shift) mod m], via two static slices + concat."""
    m = x.shape[-1]
    shift = shift % m
    if shift == 0:
        return x
    return jnp.concatenate([x[..., m - shift:], x[..., :m - shift]], axis=-1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FusedTables:
    """Full-width per-stage twiddle tables for the roll-based NTT."""

    fwd_full: jax.Array    # (S, L, m) twiddle at v-positions, 0 elsewhere
    fwd_full_s: jax.Array  # Shoup companions
    inv_full: jax.Array    # (S, L, m) twiddle at b-positions, 0 elsewhere
    inv_full_s: jax.Array
    lane: jax.Array        # (1, m) int32 coefficient index


def build_fused(plan: NttPlan) -> FusedTables:
    """Spread the plan's per-stage compact twiddles into full-width tables."""
    m = plan.length
    L = plan.num_limbs
    S = m.bit_length() - 1
    fwd = np.zeros((S, L, m), dtype=np.uint32)
    fwd_s = np.zeros((S, L, m), dtype=np.uint32)
    inv = np.zeros((S, L, m), dtype=np.uint32)
    inv_s = np.zeros((S, L, m), dtype=np.uint32)
    idx = np.arange(m)
    for s in range(S):
        half = m >> (s + 1)
        blen = m >> s
        v_pos = (idx % blen) >= half
        j = idx % blen - half
        w, ws = (np.asarray(t) for t in plan.fwd_tw[s])  # (L, half)
        fwd[s, :, v_pos] = w[:, j[v_pos]].T
        fwd_s[s, :, v_pos] = ws[:, j[v_pos]].T
    for s in range(S):
        ln = 1 << s
        b_pos = ((idx >> s) & 1) == 1
        j = idx % ln
        w, ws = (np.asarray(t) for t in plan.inv_tw[s])  # (L, ln)
        inv[s, :, b_pos] = w[:, j[b_pos]].T
        inv_s[s, :, b_pos] = ws[:, j[b_pos]].T
    lane = np.arange(m, dtype=np.int32).reshape(1, m)
    return FusedTables(
        fwd_full=jnp.asarray(fwd),
        fwd_full_s=jnp.asarray(fwd_s),
        inv_full=jnp.asarray(inv),
        inv_full_s=jnp.asarray(inv_s),
        lane=jnp.asarray(lane),
    )


def ntt_fwd_roll(x, pre, pre_s, fwd, fwd_s, lane, p, m: int):
    """Forward negacyclic NTT, roll formulation. x: (..., L, m); identical
    output (bit-reversed hat order) to ops/ntt.ntt_fwd."""
    x = mm.shoup_mul(x, pre, pre_s, p)
    S = m.bit_length() - 1
    for s in range(S):
        h = m >> (s + 1)
        e = mm.addmod(x, _roll(x, -h), p)
        o = mm.shoup_mul(mm.submod(_roll(x, h), x, p), fwd[s], fwd_s[s], p)
        is_u = (lane & jnp.int32(h)) == 0
        x = jnp.where(is_u, e, o)
    return x


def ntt_inv_roll(x, post, post_s, inv, inv_s, lane, p, m: int):
    """Inverse NTT (hat -> coefficients), mirror of ops/ntt.ntt_inv."""
    S = m.bit_length() - 1
    for s in range(S):
        h = 1 << s
        y = mm.shoup_mul(x, inv[s], inv_s[s], p)
        lo = mm.addmod(x, _roll(y, -h), p)
        hi = mm.submod(_roll(x, h), y, p)
        is_a = (lane & jnp.int32(h)) == 0
        x = jnp.where(is_a, lo, hi)
    return mm.shoup_mul(x, post, post_s, p)


_U32_LIMIT = (1 << 32) - 1


def _ntt_fwd_lazy(x, pre, pre_s, fwd, fwd_s, lane, p, mu, p_max: int, m: int):
    """Forward NTT with Harvey lazy reduction: input canonical (< p), output
    congruent mod p with per-lane bound `c * p` (returned multiplier c).

    Bound tracking: after the pre-twist every lane is < 2p; each stage at
    worst doubles the e-lane bound, and o-lanes reset to < 2p (lazy Shoup
    output). When the next stage would overflow u32, a Barrett reduction
    resets the bound — at 21-bit primes (n=64) that never triggers; at
    27-bit primes (n=512) it triggers every ~4 stages.
    """
    x = mm.shoup_mul_lazy(x, pre, pre_s, p)
    c = 2
    S = m.bit_length() - 1
    for s in range(S):
        h = m >> (s + 1)
        if 2 * c * p_max > _U32_LIMIT:
            x = mm.mod_u32(x, p, mu)
            c = 1
        e = x + _roll(x, -h)                              # < 2c p
        arg = _roll(x, h) + jnp.uint32(c) * p - x         # ≡ u - v, < 2c p
        o = mm.shoup_mul_lazy(arg, fwd[s], fwd_s[s], p)   # < 2p
        is_u = (lane & jnp.int32(h)) == 0
        x = jnp.where(is_u, e, o)
        c = 2 * c
    return x, c


def _ntt_inv_lazy(x, post, post_s, inv, inv_s, lane, p, mu, c_in: int,
                  p_max: int, m: int):
    """Inverse NTT with lazy reduction; input bound c_in * p, output CANONICAL
    (< p) — the caller feeds it straight into the next flatten."""
    S = m.bit_length() - 1
    c = c_in
    for s in range(S):
        h = 1 << s
        if (c + 2) * p_max > _U32_LIMIT:
            x = mm.mod_u32(x, p, mu)
            c = 1
        y = mm.shoup_mul_lazy(x, inv[s], inv_s[s], p)     # < 2p
        lo = x + _roll(y, -h)                             # < (c+2) p
        hi = _roll(x, h) + jnp.uint32(2) * p - y          # < (c+2) p
        is_a = (lane & jnp.int32(h)) == 0
        x = jnp.where(is_a, lo, hi)
        c = c + 2
    x = mm.shoup_mul_lazy(x, post, post_s, p)             # < 2p
    return jnp.where(x >= p, x - p, x)


def mono_mul_ladder(x, u, mono, mono_s, p):
    """x * x^u in the hat domain via the ψ-power bit ladder; u: (...,) uint32
    batch exponents matching x's leading axes (ops/ntt.monomial_mul_hat)."""
    nbits = mono.shape[0]
    cond_shape = u.shape + (1, 1)
    for b in range(nbits):
        y = mm.shoup_mul(x, mono[b], mono_s[b], p)
        bit = ((u >> b) & jnp.uint32(1)).astype(jnp.bool_).reshape(cond_shape)
        x = jnp.where(bit, y, x)
    return x


def _flatten_k(x, p, mu, inv_pj_val, inv_pj_shoup, s_mod, offset, L: int):
    """In-kernel mixed-radix balanced flatten (mirrors ops/rns.flatten) in the
    limb-major layout: x (L, T, m) -> list of L digits, each (L, T, m).

    p, mu, offset: (L, 1, 1); s_mod: (L, L, 1, 1); inv tables (L, L) scalars.
    """
    y = mm.addmod(x, offset, p)
    digits = []
    for i in range(L):
        t = y[i]  # (T, m)
        pi = p[i]  # (1, 1)
        for j in range(i):
            dj = mm.mod_u32(digits[j], pi, mu[i])
            t = mm.submod(t, dj, pi)
            t = mm.shoup_mul(t, inv_pj_val[i, j], inv_pj_shoup[i, j], pi)
        digits.append(t)
    out = []
    for i in range(L):
        d = digits[i][None]  # (1, T, m)
        e = mm.mod_u32(d, p, mu)  # (L, T, m)
        e = mm.submod(e, s_mod[i], p)
        out.append(e)
    return out


def _rotate_kernel(
    # inputs (order matters — must match pallas_call operands)
    ua_ref, a0_ref, b0_ref, bk_ref, bks_ref,
    pre_ref, pre_s_ref, post_ref, post_s_ref,
    fwd_ref, fwd_s_ref, inv_ref, inv_s_ref, lane_ref,
    mono_ref, mono_s_ref,
    p_ref, mu_ref, ipj_ref, ipj_s_ref, smod_ref, off_ref,
    wval_ref, wshoup_ref,
    # outputs
    a_out_ref, b_out_ref,
    *, n: int, l: int, L: int, m: int, p_max: int,
):
    """Kernel-internal layout is limb-major (L, T, m): the minor two dims
    (T, m) fill whole sublane×lane tiles regardless of the limb count."""
    p = p_ref[:]          # (L, 1, 1)
    mu = mu_ref[:]
    pre, pre_s = pre_ref[:], pre_s_ref[:]        # (L, 1, m)
    post, post_s = post_ref[:], post_s_ref[:]
    fwd, fwd_s = fwd_ref[:], fwd_s_ref[:]        # (S, L, 1, m)
    inv, inv_s = inv_ref[:], inv_s_ref[:]
    lane = lane_ref[:]                            # (1, m)
    mono, mono_s = mono_ref[:], mono_s_ref[:]    # (nbits, L, 1, m)
    ipj, ipj_s = ipj_ref[:], ipj_s_ref[:]        # (L, L)
    smod, off = smod_ref[:], off_ref[:]          # (L, L, 1, 1), (L, 1, 1)
    wval, wshoup = wval_ref[:], wshoup_ref[:]    # (l, L, 1, 1)

    def step(k, carry):
        a_acc, b_acc = carry  # (L, T, m), canonical residues
        ck = bk_ref[pl.ds(k, 1)][0]    # (2l, 2, L, m)
        cks = bks_ref[pl.ds(k, 1)][0]
        u_k = ua_ref[pl.ds(k, 1)][0]   # (T, 1)

        da = _flatten_k(a_acc, p, mu, ipj, ipj_s, smod, off, L)
        db = _flatten_k(b_acc, p, mu, ipj, ipj_s, smod, off, L)
        digits = jnp.stack(da + db, axis=0)  # (2l, L, T, m)
        d_hat, _ = _ntt_fwd_lazy(
            digits, pre, pre_s, fwd, fwd_s, lane, p, mu, p_max, m
        )

        outs = []
        for c in range(2):
            # lazy accumulation: each Shoup product < 2p, sums tracked below
            s_acc = None
            t_acc = None
            for row in range(2 * l):
                prod = mm.shoup_mul_lazy(
                    d_hat[row], ck[row, c][:, None, :], cks[row, c][:, None, :],
                    p,
                )
                s_acc = prod if s_acc is None else s_acc + prod
            for i in range(l):
                row = i if c == 0 else l + i
                wprod = mm.shoup_mul_lazy(d_hat[row], wval[i], wshoup[i], p)
                t_acc = wprod if t_acc is None else t_acc + wprod
            cs = ct = 2 * (2 * l)  # bound multipliers (in units of p)
            if (2 * cs + ct) * p_max > _U32_LIMIT:
                s_acc = mm.mod_u32(s_acc, p, mu)
                t_acc = mm.mod_u32(t_acc, p, mu)
                cs = ct = 1
            # monomial bit-ladder: rot = x^{u_k} * s_acc (bound stays cs*p:
            # multiplied lanes drop under 2p <= cs*p, others keep cs*p)
            rot = s_acc
            for b in range(mono.shape[0]):
                y = mm.shoup_mul_lazy(rot, mono[b], mono_s[b], p)
                bit = ((u_k >> b) & jnp.uint32(1)).astype(jnp.bool_)[None]
                rot = jnp.where(bit, y, rot)  # (1, T, 1) vs (L, T, m)
            # val = rot - s_acc + t_acc, kept nonnegative via +cs*p
            val = rot + (jnp.uint32(cs) * p - s_acc) + t_acc
            outs.append(
                _ntt_inv_lazy(
                    val, post, post_s, inv, inv_s, lane, p, mu,
                    2 * cs + ct, p_max, m,
                )
            )
        return outs[0], outs[1]

    a0 = jnp.transpose(a0_ref[:], (1, 0, 2))  # (T, L, m) -> (L, T, m)
    b0 = jnp.transpose(b0_ref[:], (1, 0, 2))
    a_acc, b_acc = jax.lax.fori_loop(0, n, step, (a0, b0))
    a_out_ref[:] = jnp.transpose(a_acc, (1, 0, 2))
    b_out_ref[:] = jnp.transpose(b_acc, (1, 0, 2))


def _rotate_step_kernel(
    # inputs
    ua_ref, a0_ref, b0_ref, bk_ref, bks_ref,
    pre_ref, pre_s_ref, post_ref, post_s_ref,
    fwd_ref, fwd_s_ref, inv_ref, inv_s_ref, lane_ref,
    mono_ref, mono_s_ref,
    p_ref, mu_ref, ipj_ref, ipj_s_ref, smod_ref, off_ref,
    wval_ref, wshoup_ref,
    # outputs (revisited across the k grid axis — the rotation accumulator)
    a_out_ref, b_out_ref,
    *, n: int, l: int, L: int, m: int, p_max: int,
):
    """One blind-rotation step per grid point (t, k): the key-index axis k is
    a GRID dimension, so Pallas streams the (1, 2l, 2, L, m) bootstrap-key
    slice for step k from HBM into VMEM with automatic double-buffering —
    this is how n=512 (≈600 MB key) runs with a ~2.3 MB VMEM key footprint.
    The accumulator lives in the revisited output blocks (limb-major
    (L, T, m)), which stay VMEM-resident for all n steps of a tile."""
    k = pl.program_id(1)
    p = p_ref[:]
    mu = mu_ref[:]

    @pl.when(k == 0)
    def _init():
        a_out_ref[:] = a0_ref[:]
        b_out_ref[:] = b0_ref[:]

    a_acc = a_out_ref[:]
    b_acc = b_out_ref[:]
    ck = bk_ref[0]    # (2l, 2, L, m) — this step's key slice
    cks = bks_ref[0]
    u_k = ua_ref[0]   # (T, 1)
    ipj, ipj_s = ipj_ref[:], ipj_s_ref[:]
    smod, off = smod_ref[:], off_ref[:]

    da = _flatten_k(a_acc, p, mu, ipj, ipj_s, smod, off, L)
    db = _flatten_k(b_acc, p, mu, ipj, ipj_s, smod, off, L)
    digits = jnp.stack(da + db, axis=0)  # (2l, L, T, m)
    lane = lane_ref[:]
    d_hat, _ = _ntt_fwd_lazy(
        digits, pre_ref[:], pre_s_ref[:], fwd_ref[:], fwd_s_ref[:], lane, p,
        mu, p_max, m,
    )

    wval, wshoup = wval_ref[:], wshoup_ref[:]
    mono, mono_s = mono_ref[:], mono_s_ref[:]
    outs = []
    for c in range(2):
        s_acc = None
        t_acc = None
        for row in range(2 * l):
            prod = mm.shoup_mul_lazy(
                d_hat[row], ck[row, c][:, None, :], cks[row, c][:, None, :], p
            )
            s_acc = prod if s_acc is None else s_acc + prod
        for i in range(l):
            row = i if c == 0 else l + i
            wprod = mm.shoup_mul_lazy(d_hat[row], wval[i], wshoup[i], p)
            t_acc = wprod if t_acc is None else t_acc + wprod
        cs = ct = 2 * (2 * l)
        if (2 * cs + ct) * p_max > _U32_LIMIT:
            s_acc = mm.mod_u32(s_acc, p, mu)
            t_acc = mm.mod_u32(t_acc, p, mu)
            cs = ct = 1
        rot = s_acc
        for b in range(mono.shape[0]):
            y = mm.shoup_mul_lazy(rot, mono[b], mono_s[b], p)
            bit = ((u_k >> b) & jnp.uint32(1)).astype(jnp.bool_)[None]
            rot = jnp.where(bit, y, rot)
        val = rot + (jnp.uint32(cs) * p - s_acc) + t_acc
        outs.append(
            _ntt_inv_lazy(
                val, post_ref[:], post_s_ref[:], inv_ref[:], inv_s_ref[:],
                lane, p, mu, 2 * cs + ct, p_max, m,
            )
        )
    a_out_ref[:] = outs[0]
    b_out_ref[:] = outs[1]


def blind_rotate_streamed(
    params, ctx, bkey_hat, bkey_shoup, ua, a0, b0, *,
    tile: int | None = None, interpret: bool = False,
):
    """Blind rotation with the bootstrap key STREAMED from HBM (grid axis over
    key steps, Pallas double-buffers the per-step slice). Works at any n —
    used when the key exceeds the VMEM budget (e.g. Params(512), ~600 MB).

    ua: (B, n); a0, b0: (B, L, m). Returns (a_acc, b_acc) (B, L, m)."""
    n, l, L, m = params.n, params.num_digits, params.num_limbs, params.m
    plan = ctx.plan_Q
    rns = ctx.rns
    ft = ctx.fused
    B = ua.shape[0]
    if tile is None:
        tile = _auto_tile(params, 32)
    tile = min(tile, max(8, B))
    padded = ((B + tile - 1) // tile) * tile
    if padded != B:
        padB = padded - B
        ua = jnp.pad(ua, ((0, padB), (0, 0)))
        a0 = jnp.pad(a0, ((0, padB), (0, 0), (0, 0)))
        b0 = jnp.pad(b0, ((0, padB), (0, 0), (0, 0)))
    num_tiles = padded // tile
    # limb-major accumulator layout (L, B, m): minor dims (T, m) fully tiled
    a0_lm = jnp.transpose(a0, (1, 0, 2))
    b0_lm = jnp.transpose(b0, (1, 0, 2))

    def acc_spec():
        return pl.BlockSpec(
            (L, tile, m), lambda t, k: (0, t, 0), memory_space=pltpu.VMEM
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    p_max = max(params.moduli)
    kernel = partial(_rotate_step_kernel, n=n, l=l, L=L, m=m, p_max=p_max)
    out_shape = [
        jax.ShapeDtypeStruct((L, padded, m), jnp.uint32),
        jax.ShapeDtypeStruct((L, padded, m), jnp.uint32),
    ]
    in_specs = [
        pl.BlockSpec(
            (1, tile, 1), lambda t, k: (k, t, 0), memory_space=pltpu.VMEM
        ),              # ua (n, B, 1): step exponents
        acc_spec(),     # a0
        acc_spec(),     # b0
        pl.BlockSpec(
            (1,) + bkey_hat.shape[1:], lambda t, k: (k, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),              # bkey slice for step k (streamed)
        pl.BlockSpec(
            (1,) + bkey_shoup.shape[1:], lambda t, k: (k, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    ] + [full()] * 19
    out_specs = [acc_spec(), acc_spec()]

    a_lm, b_lm = pl.pallas_call(
        kernel,
        grid=(num_tiles, n),
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(
        ua.T[:, :, None], a0_lm, b0_lm, bkey_hat, bkey_shoup,
        plan.pre_tw[:, None, :], plan.pre_tw_s[:, None, :],
        plan.post_tw[:, None, :], plan.post_tw_s[:, None, :],
        ft.fwd_full[:, :, None, :], ft.fwd_full_s[:, :, None, :],
        ft.inv_full[:, :, None, :], ft.inv_full_s[:, :, None, :],
        ft.lane,
        plan.mono_pow[:, :, None, :], plan.mono_pow_s[:, :, None, :],
        plan.p[:, :, None], plan.mu[:, :, None],
        rns.inv_pj_val, rns.inv_pj_shoup,
        rns.s_mod[:, :, :, None], rns.offset[:, :, None],
        rns.w_val[:, :, :, None], rns.w_shoup[:, :, :, None],
    )
    a_acc = jnp.transpose(a_lm, (1, 0, 2))
    b_acc = jnp.transpose(b_lm, (1, 0, 2))
    if padded != B:
        a_acc = a_acc[:B]
        b_acc = b_acc[:B]
    return a_acc, b_acc


import os as _os

_TILE_ENV = _os.environ.get("SGFHE_TILE")


def _auto_tile(params, default: int) -> int:
    """Batch-tile size for the resident kernel. The per-tile VMEM working set
    (digits + d_hat + accumulators, ~14 arrays of (L, tile, m) u32) must stay
    under the ~16 MB scoped-vmem stack limit alongside the resident key, so
    cap tile so that 16 * L * tile * m * 4 bytes <= 4 MB (measured: tile=64
    at L=3, m=512 trips the limit at large batch counts; tile=32 is within
    1% of its throughput and always fits)."""
    if _TILE_ENV:
        return int(_TILE_ENV)
    L, m = params.num_limbs, params.m
    cap = (4 * 1024 * 1024) // (16 * L * m * 4)
    t = 8
    while t * 2 <= min(default, max(8, cap)):
        t *= 2
    return t


def blind_rotate_fused(
    params, ctx, bkey_hat, bkey_shoup, ua, a0, b0, *,
    tile: int | None = None, interpret: bool = False,
):
    """Run the full n-step blind rotation on a gate batch with one Pallas
    kernel launch (grid over batch tiles; bootstrap key VMEM-resident).

    ua: (B, n) mod-r rotation exponents; a0, b0: (B, L, m) initial
    accumulators. Returns (a_acc, b_acc) of shape (B, L, m).
    """
    n, l, L, m = params.n, params.num_digits, params.num_limbs, params.m
    plan = ctx.plan_Q
    rns = ctx.rns
    ft = ctx.fused
    B = ua.shape[0]
    if tile is None:
        tile = _auto_tile(params, 64)
    tile = min(tile, max(8, B))
    padded = ((B + tile - 1) // tile) * tile
    if padded != B:
        padB = padded - B
        ua = jnp.pad(ua, ((0, padB), (0, 0)))
        a0 = jnp.pad(a0, ((0, padB), (0, 0), (0, 0)))
        b0 = jnp.pad(b0, ((0, padB), (0, 0), (0, 0)))
    grid = (padded // tile,)

    def tile_spec(rank_tail):
        # batch-tiled operand: block (tile, *tail), program i owns row-block i
        return pl.BlockSpec(
            (tile,) + rank_tail,
            lambda i: (i,) + (0,) * len(rank_tail),
            memory_space=pltpu.VMEM,
        )

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731

    p_max = max(params.moduli)
    kernel = partial(_rotate_kernel, n=n, l=l, L=L, m=m, p_max=p_max)
    out_shape = [
        jax.ShapeDtypeStruct((padded, L, m), jnp.uint32),
        jax.ShapeDtypeStruct((padded, L, m), jnp.uint32),
    ]
    in_specs = [
        pl.BlockSpec(
            (n, tile, 1), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),                      # ua (key-bit-major, (n, B, 1))
        tile_spec((L, m)),      # a0
        tile_spec((L, m)),      # b0
    ] + [full()] * 21
    out_specs = [tile_spec((L, m)), tile_spec((L, m))]

    a_acc, b_acc = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(
        ua.T[:, :, None], a0, b0, bkey_hat, bkey_shoup,
        plan.pre_tw[:, None, :], plan.pre_tw_s[:, None, :],
        plan.post_tw[:, None, :], plan.post_tw_s[:, None, :],
        ft.fwd_full[:, :, None, :], ft.fwd_full_s[:, :, None, :],
        ft.inv_full[:, :, None, :], ft.inv_full_s[:, :, None, :],
        ft.lane,
        plan.mono_pow[:, :, None, :], plan.mono_pow_s[:, :, None, :],
        plan.p[:, :, None], plan.mu[:, :, None],
        rns.inv_pj_val, rns.inv_pj_shoup,
        rns.s_mod[:, :, :, None], rns.offset[:, :, None],
        rns.w_val[:, :, :, None], rns.w_shoup[:, :, :, None],
    )
    if padded != B:
        a_acc = a_acc[:B]
        b_acc = b_acc[:B]
    return a_acc, b_acc


def fused_bkey_vmem_bytes(params) -> int:
    """VMEM footprint of the resident bootstrap key (values + Shoup)."""
    n, l, L, m = params.n, params.num_digits, params.num_limbs, params.m
    return 2 * n * (2 * l) * 2 * L * m * 4
