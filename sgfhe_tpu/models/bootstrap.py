"""Gate bootstrap — THE hot path (reference src/fhe.jl:519-621) and LWE
repacking (src/fhe.jl:632-696), rebuilt TPU-first.

Key deviations from the reference's loop structure (all semantics-preserving):

 - **Batch axis of gates everywhere.** The reference bootstraps one gate at a
   time; here every kernel carries a leading batch axis, the throughput lever
   on TPU (SURVEY.md §2.4 "data parallelism").
 - **Bootstrap key lives in the NTT domain** (with Shoup companions). The
   reference's `mul_by_xj_minus_one` on coefficient polynomials
   (src/fhe.jl:554-556, 580) becomes a ψ-power table gather + pointwise
   multiply: (x^u - 1)·C + G in hat space is  e ⊙ (d·Ĉ) - (d·Ĉ) + Σ w_i d̂_i,
   where e[idx] = ψ^{E[idx]·u}. No forward transform of the key per step, no
   transform of A at all — only the 2l digit transforms and 2 inverse
   transforms per step per limb.
 - **External product under RNS**: flatten is the balanced mixed-radix digit
   extraction (ops/rns.py), and the gadget-matrix action Σ_r d̂_r·Â[r,c]
   distributes into the three terms above because G's entries are the
   constant polynomials w_i (reference gadget_matrix src/fhe.jl:119-122).
 - The n-step blind rotation itself stays sequential (`lax.fori_loop`), as its
   data dependency demands (src/fhe.jl:579-582).

Deterministic by default (the reference's rng=nothing mode); pass a PRNG key
for randomized flattening.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import fused as fused_mod
from ..ops import modmath as mm
from ..ops import ntt as ntt_mod
from ..ops import poly as pol
from ..ops import rns as rns_mod
from .params import Params
from .scheme1 import EncryptedBit, LWE, RLWE, Ciphertext, SchemeContext

# Fused-kernel dispatch: "auto" uses the Pallas kernel on TPU for the
# deterministic path whenever the bootstrap key fits in VMEM; "never" forces
# the jnp path; "interpret" runs the kernel in interpreter mode (CPU tests).
import os

FUSED_MODE = os.environ.get("SGFHE_FUSED", "auto")
_FUSED_VMEM_BUDGET = 10 * 1024 * 1024


def _use_fused(params: Params) -> tuple[str, bool]:
    """(kernel, interpret): kernel is 'none' (jnp path), 'resident' (key in
    VMEM for the whole rotation) or 'streamed' (key double-buffered from HBM
    — any size). Both serve randomized flattening too: every path draws the
    SAME documented Threefry-2x32 mask stream (ops/prg.py), so fused == jnp
    bit-for-bit in randomized mode as well (tests/test_fused.py)."""
    if FUSED_MODE == "never":
        return "none", False
    resident_ok = fused_mod.fused_bkey_vmem_bytes(params) <= _FUSED_VMEM_BUDGET
    kernel = "resident" if resident_ok else "streamed"
    if FUSED_MODE == "interpret":
        return kernel, True
    if FUSED_MODE in ("resident", "streamed"):
        kernel = FUSED_MODE
    return (kernel if jax.default_backend() == "tpu" else "none"), False


def _external_step(params: Params, ctx: SchemeContext, a_acc, b_acc, ck_hat,
                   ck_shoup, u_k, seed2, step_k, prune: int = 0):
    """One blind-rotation step: (a, b) <- (a, b) ⊙ ((x^{u_k}-1)·C_k + G).

    a_acc, b_acc: (batch, L, m) coefficient-domain RNS.
    ck_hat/ck_shoup: (2l, 2, L, m). u_k: (batch,) mod r = 2m.
    seed2: None (deterministic flatten) or the two Threefry key words;
    step_k names the step in the documented mask stream (ops/prg.py) —
    the SAME stream the fused kernels draw, so jnp == fused bit-for-bit in
    randomized mode too.
    """
    plan = ctx.plan_Q
    rns = ctx.rns
    l = params.num_digits
    p = plan.p

    if seed2 is None:
        da = rns_mod.flatten(rns, a_acc, prune)  # (batch, l - prune, L, m)
        db = rns_mod.flatten(rns, b_acc, prune)
    else:
        da = rns_mod.flatten_random(
            rns, a_acc, params.moduli, seed2, step_k, op=0, prune=prune
        )
        db = rns_mod.flatten_random(
            rns, b_acc, params.moduli, seed2, step_k, op=1, prune=prune
        )
    digits = jnp.concatenate([da, db], axis=-3)  # (batch, 2(l-prune), L, m)
    d_hat = ntt_mod.ntt_fwd(plan, digits)
    lk = l - prune  # kept digits per operand (approximate gadget; see
    # models/params.prune_error_bound for the admitted noise)

    # S_c = sum_r d̂_r · Ĉ[r, c]   (Shoup multiplies, unrolled over kept rows)
    # T_c = sum_i w_i · d̂_{col-digits i}  == hat of the undecomposed operand
    #       minus the pruned part (acc - eps)
    new_hats = []
    for c in range(2):
        s_acc = None
        t_acc = None
        for row in range(2 * lk):
            krow = prune + row if row < lk else l + prune + (row - lk)
            prod = mm.shoup_mul(
                d_hat[..., row, :, :], ck_hat[krow, c], ck_shoup[krow, c], p
            )
            s_acc = prod if s_acc is None else mm.addmod(s_acc, prod, p)
        for i in range(lk):
            row = i if c == 0 else lk + i
            wprod = mm.shoup_mul(
                d_hat[..., row, :, :],
                rns.w_val[prune + i], rns.w_shoup[prune + i], p
            )
            t_acc = wprod if t_acc is None else mm.addmod(t_acc, wprod, p)
        new_hats.append((s_acc, t_acc))

    outs = []
    for s_acc, t_acc in new_hats:
        rot = ntt_mod.monomial_mul_hat(plan, s_acc, u_k)
        val = mm.addmod(mm.submod(rot, s_acc, p), t_acc, p)
        outs.append(ntt_mod.ntt_inv(plan, val))
    return outs[0], outs[1]


def blind_rotate(
    params,
    ctx,
    bkey_hat: jax.Array,
    bkey_shoup: jax.Array,
    ua: jax.Array,
    a_acc: jax.Array,
    b_acc: jax.Array,
    flat_key=None,
    fused: tuple[str, bool] = ("none", False),
    prune: int = 0,
):
    """The shared n-step rotation core (reference hot loop src/fhe.jl:579-582):
    (a, b) <- (a, b) ⊙ ((x^{u_k}-1)·C_k + G) for k = 0..n-1, batched.

    Scheme-agnostic: any params/ctx with (n, m, num_limbs, num_digits, moduli)
    and (plan_Q, rns, fused) works — scheme 2's functional bootstrap
    (models/bootstrap2.py) drives the same kernels. ua: (batch, n) mod-r
    exponents; a_acc, b_acc: (batch, L, m) initial accumulator.
    """
    n = params.n
    if prune:
        from .params import prune_error_bound

        bound = prune_error_bound(params, prune)
        assert bound < params.Dr / 16, (
            f"digit pruning prune={prune} admits post-rescale noise "
            f"{bound:.3g}, too close to the Dr/4 = {params.Dr // 4} decision "
            f"budget (guard: < Dr/16 = {params.Dr / 16:.3g})"
        )
    fused_kernel, fused_interp = fused
    if fused_kernel in ("resident", "streamed"):
        # randomized mode: the two Threefry key words ride SMEM as int32;
        # the kernel draws the documented counter stream (ops/prg.py)
        seed = None
        if flat_key is not None:
            lo, hi = rns_mod.seed_words(flat_key)
            seed = jnp.stack([lo, hi]).reshape(1, 2).astype(jnp.int32)
        rotate = (
            fused_mod.blind_rotate_fused
            if fused_kernel == "resident"
            else fused_mod.blind_rotate_streamed
        )
        a_acc, b_acc = rotate(
            params, ctx, bkey_hat, bkey_shoup, ua, a_acc, b_acc,
            interpret=fused_interp, seed=seed, prune=prune,
        )
    else:
        seed2 = None if flat_key is None else rns_mod.seed_words(flat_key)

        def body(k, carry):
            a_acc, b_acc = carry
            ck_hat = jax.lax.dynamic_index_in_dim(bkey_hat, k, 0, keepdims=False)
            ck_shoup = jax.lax.dynamic_index_in_dim(
                bkey_shoup, k, 0, keepdims=False
            )
            u_k = jax.lax.dynamic_index_in_dim(ua, k, 1, keepdims=False)
            return _external_step(
                params, ctx, a_acc, b_acc, ck_hat, ck_shoup, u_k, seed2, k,
                prune,
            )

        a_acc, b_acc = jax.lax.fori_loop(0, n, body, (a_acc, b_acc))
    return a_acc, b_acc


def bootstrap_internal(
    params: Params,
    ctx: SchemeContext,
    bkey_hat: jax.Array,
    bkey_shoup: jax.Array,
    a1: jax.Array, b1: jax.Array, a2: jax.Array, b2: jax.Array,
    flat_key=None,
    fused: tuple[str, bool] = ("none", False),
    prune: int = 0,
):
    """Blind rotation + gate extraction (reference src/fhe.jl:559-595),
    batched.

    a1, a2: (batch, n); b1, b2: (batch,); all mod r.
    Returns three LWEs over Q as ((batch, L, n), (batch, L)) pairs.
    """
    n, m, L = params.n, params.m, params.num_limbs
    mask = jnp.uint32(params.mask_r)
    plan = ctx.plan_Q

    ua = (a1 + a2) & mask  # (batch, n)
    ub = (b1 + b2) & mask  # (batch,)

    batch = ua.shape[0]
    # b0 = t(x) * DQ~ * x^{-ub}: rotate in the hat domain (gather-free bit
    # ladder) and invert once, instead of a coefficient-domain gather
    tpoly_hat_b = jnp.broadcast_to(ctx.tpoly_dq_hat, (batch, L, m))
    shift = (jnp.uint32(2 * m) - ub) & jnp.uint32(2 * m - 1)
    b_acc = ntt_mod.ntt_inv(
        plan, ntt_mod.monomial_mul_hat(plan, tpoly_hat_b, shift)
    )
    a_acc = jnp.zeros((batch, L, m), dtype=jnp.uint32)

    a_acc, b_acc = blind_rotate(
        params, ctx, bkey_hat, bkey_shoup, ua, a_acc, b_acc, flat_key, fused,
        prune,
    )

    i_and = 3 * m // 4
    i_or = m // 4
    p = plan.p
    a_and = pol.extract(a_acc, i_and, n, p)            # (batch, L, n)
    b_and = mm.addmod(ctx.dq_tilde[:, 0], b_acc[..., i_and], p[:, 0])
    a_or = mm.negmod(pol.extract(a_acc, i_or, n, p), p)
    b_or = mm.submod(ctx.dq_tilde[:, 0], b_acc[..., i_or], p[:, 0])
    a_xor = mm.submod(a_or, a_and, p)
    b_xor = mm.submod(b_or, b_and, p[:, 0])
    return (a_and, b_and), (a_or, b_or), (a_xor, b_xor)


def _reduce_lwe(params: Params, ctx: SchemeContext, lwe_q):
    """Modulus switch Q -> r on an RNS LWE (reference src/fhe.jl:616-618 via
    src/utils.jl:120-127)."""
    a_q, b_q = lwe_q
    a_r = rns_mod.rescale_exact(ctx.rns, a_q, params.r, params.moduli)
    b_r = rns_mod.rescale_exact(
        ctx.rns, b_q[..., None], params.r, params.moduli
    )[..., 0]
    return LWE(a_r, b_r)


@partial(jax.jit, static_argnums=(0, 7, 8, 9))
def _bootstrap_batch_jit(
    params: Params,
    ctx: SchemeContext,
    bkey_hat: jax.Array,
    bkey_shoup: jax.Array,
    lwe1: LWE,
    lwe2: LWE,
    flat_key=None,
    randomized: bool = False,
    fused: tuple[str, bool] = ("none", False),
    prune: int = 0,
):
    fk = flat_key if randomized else None
    triple = bootstrap_internal(
        params, ctx, bkey_hat, bkey_shoup, lwe1.a, lwe1.b, lwe2.a, lwe2.b, fk,
        fused=fused, prune=prune,
    )
    return tuple(_reduce_lwe(params, ctx, t) for t in triple)


def bootstrap_batch(
    params: Params,
    ctx: SchemeContext,
    bkey_hat: jax.Array,
    bkey_shoup: jax.Array,
    lwe1: LWE,
    lwe2: LWE,
    flat_key=None,
    randomized: bool = False,
    epoch: "int | None" = None,
    prune: int = 0,
):
    """Batched gate bootstrap: returns (AND, OR, XOR) LWE batches mod r
    (reference src/fhe.jl:608-621). One pass computes all three gates.

    Dispatches to the fused Pallas rotation kernel on TPU (deterministic
    mode, VMEM-resident key); jnp fori-loop path otherwise.

    Randomized mode folds a fresh per-call epoch into flat_key by default,
    so repeated calls with the same key never replay the same mask stream
    (ops/prg.py); pass an explicit `epoch` int for reproducible masks.

    prune > 0 enables APPROXIMATE gadget decomposition (drop the `prune`
    lowest digit rows of the external product) — the opt-in fast mode: the
    result is no longer bit-identical to the exact path, but decrypts
    identically; the admitted phase noise (models/params.prune_error_bound,
    derivation docs/theory.md) is asserted < Dr/16 at trace time. prune=0
    (default) is the bit-exact-vs-reference mode."""
    from ..ops import prg

    fused = _use_fused(params)
    if randomized:
        flat_key = prg.fold_epoch(flat_key, epoch)
    return _bootstrap_batch_jit(
        params, ctx, bkey_hat, bkey_shoup, lwe1, lwe2, flat_key, randomized,
        fused, prune,
    )


def bootstrap(params, ctx, bkey, enc_bit1: EncryptedBit, enc_bit2: EncryptedBit,
              flat_key=None, epoch: "int | None" = None):
    """Single- or batched-gate convenience wrapper returning EncryptedBits."""
    a1 = jnp.atleast_2d(enc_bit1.lwe.a)
    a2 = jnp.atleast_2d(enc_bit2.lwe.a)
    b1 = jnp.atleast_1d(enc_bit1.lwe.b)
    b2 = jnp.atleast_1d(enc_bit2.lwe.b)
    res = bootstrap_batch(
        params, ctx, bkey.hat, bkey.hat_shoup, LWE(a1, b1), LWE(a2, b2),
        flat_key, flat_key is not None, epoch,
    )
    out = []
    for lwe in res:
        if enc_bit1.lwe.a.ndim == 1:
            out.append(EncryptedBit(LWE(lwe.a[0], lwe.b[0])))
        else:
            out.append(EncryptedBit(lwe))
    return tuple(out)


# ---------------------------------------------------------------------------
# LWE repacking (reference src/fhe.jl:632-696)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 5, 7))
def pack_encrypted_bits_jit(
    params: Params,
    ctx: SchemeContext,
    bkey_hat: jax.Array,
    bkey_shoup: jax.Array,
    enc_bits: LWE,
    randomized: bool = False,
    flat_key=None,
    fused: tuple[str, bool] = ("none", False),
):
    """n EncryptedBits -> one RLWE over R_{m,r} (src/fhe.jl:660-696).

    The n trivial-input bootstraps run as ONE batch of n gates; the n
    shortened external products run as one batched flatten+NTT+reduce.
    """
    n, m, L, l = params.n, params.m, params.num_limbs, params.num_digits
    plan = ctx.plan_Q
    p = plan.p
    rns = ctx.rns

    # trivial LWE encrypting 1: a = 0, b = Dr (src/fhe.jl:670-671)
    a_triv = jnp.zeros((n, n), dtype=jnp.uint32)
    b_triv = jnp.full((n,), params.Dr, dtype=jnp.uint32)

    # PRNG hygiene: the bootstrap consumes flat_key by splitting it into
    # per-step keys, so the pack-stage flatten must use a DISJOINT subkey —
    # never the parent key again (the reference's sequential rng stream
    # naturally never reuses state, src/fhe.jl:660-683).
    if randomized:
        fk_boot, fk_pack = jax.random.split(flat_key)
    else:
        fk_boot = fk_pack = None
    (a_q, b_q), _, _ = bootstrap_internal(
        params, ctx, bkey_hat, bkey_shoup, a_triv, b_triv, enc_bits.a,
        enc_bits.b, fk_boot, fused=fused,
    )
    # a_q: (n_gates, L, n_coeff); transpose so polynomial i collects
    # coefficient i of every gate's LWE (src/fhe.jl:675-678), then zero-pad
    as_polys = pol.resize(jnp.transpose(a_q, (2, 1, 0)), m)  # (n, L, m)
    b_poly = pol.resize(jnp.transpose(b_q, (1, 0)), m)       # (L, m)

    # shortened external products against rows l..2l-1 (src/fhe.jl:632-641)
    if fk_pack is None:
        d = rns_mod.flatten(rns, as_polys)  # (n, l, L, m)
    else:
        # pack-stage stream: its own seed (disjoint subkey), step = n (one
        # beyond any rotation step), gate axis = the key-polynomial index
        d = rns_mod.flatten_random(
            rns, as_polys, params.moduli, rns_mod.seed_words(fk_pack), n, op=0
        )
    d_hat = ntt_mod.ntt_fwd(plan, d)
    acc = [None, None]
    for c in range(2):
        for i in range(l):
            prod = mm.shoup_mul(
                d_hat[:, i], bkey_hat[:, l + i, c], bkey_shoup[:, l + i, c], p
            )  # (n, L, m)
            acc[c] = prod if acc[c] is None else mm.addmod(acc[c], prod, p)
    # global sums over the key index i (src/fhe.jl:686-687) — hat domain is
    # linear so we sum there and invert once
    w_hat = _sum_mod(acc[0], p)  # (L, m)
    v_hat = _sum_mod(acc[1], p)
    w_tilde = ntt_mod.ntt_inv(plan, w_hat)
    v_tilde = ntt_mod.ntt_inv(plan, v_hat)

    w1 = mm.negmod(w_tilde, p)
    v1 = mm.submod(b_poly, v_tilde, p)

    w_r = rns_mod.rescale_exact(rns, w1, params.r, params.moduli)
    v_r = rns_mod.rescale_exact(rns, v1, params.r, params.moduli)
    return RLWE(w_r, v_r)


def _sum_mod(x, p):
    """Tree-sum over leading axis with modular reduction (avoids overflow:
    pairwise addmod)."""
    while x.shape[0] > 1:
        k = x.shape[0]
        if k % 2 == 1:
            x = jnp.concatenate([x, jnp.zeros_like(x[:1])], axis=0)
            k += 1
        x = mm.addmod(x[: k // 2], x[k // 2 :], p)
    return x[0]


def pack_encrypted_bits(params, ctx, bkey, enc_bits: EncryptedBit,
                        flat_key=None, epoch: "int | None" = None) -> Ciphertext:
    from ..ops import prg

    fused = _use_fused(params)
    if flat_key is not None:
        flat_key = prg.fold_epoch(flat_key, epoch)
    rlwe = pack_encrypted_bits_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, enc_bits.lwe,
        flat_key is not None, flat_key, fused,
    )
    return Ciphertext(params, rlwe)
