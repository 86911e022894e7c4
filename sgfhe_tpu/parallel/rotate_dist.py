"""Tensor-parallel blind rotation: the polynomial/hat axis m spans the 'tp'
mesh axis via the four-step distributed NTT (parallel/ntt_dist.py).

This is the path to bootstrap keys larger than one chip's HBM and to the
giant-m parameter sets (scheme-2 k >= 3 has m = 8192+ and keys of 2-17 GiB,
reference src/fhe2.jl:36-39): each device holds a 1/D slice of every
bootstrap-key step (hat rows), the small (batch, L, m/D) accumulators are
re-sharded between the coefficient and hat domains by the four-step NTT's
`all_to_all`s, and all other work — flatten, gadget accumulation, monomial
ladder — is pointwise in whichever domain it runs, so it shards for free.
This distributes the reference's hot loop (src/fhe.jl:579-582) across chips.

Layouts (D = mesh.shape['tp']):
  coefficient domain: (..., L, m1, m2), m2 axis sharded -> local m2/D columns
  hat domain:         (..., L, m1, m2), m1 axis sharded -> local m1/D rows
  bootstrap key:      (n, 2l, 2, L, m1, m2) hat, m1 axis sharded (the ONLY
                      giant operand; per-device share = key_bytes / D)

Hat-position evaluation map: position (pos1, pos2) evaluates the polynomial
at ψ^{E}, E = 1 + 2*(br1(pos1) + m1*br2(pos2)) mod 2m — the composition of
the ψ pre-twist with the two bit-reversed sub-DFTs (derivation checked
empirically by tests/test_rotate_dist.py against monomial inputs). The
monomial bit-ladder tables are precomputed on that map, so the rotation's
(x^u - 1)·C products stay gather-free exactly as in the fused kernels.

Per rotation step the communication is TWO all_to_alls of the digit/
accumulator tiles (batch*(2l+2)*L*m words total) over ICI — the key never
moves. Both flattening modes work: randomized masks are drawn from the
documented Threefry counter stream (ops/prg.py) on GLOBAL (gate, coeff)
coordinates, so the sharded randomized rotation is bit-identical to the
single-device one too.

Exactness: every op is exact modular arithmetic, and the pointwise products
pair identical evaluation points in both the single-device and distributed
hat orders, so the result is BIT-IDENTICAL to models/bootstrap.blind_rotate
(asserted at m=8192 on the 8-device CPU mesh, tests/test_rotate_dist.py).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops import modmath as mm
from ..ops import ntt as ntt_mod
from ..ops import rns as rns_mod
from ..utils import primes as pr
from . import ntt_dist as nd


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistRotationPlan:
    """Four-step NTT plan + monomial-ladder tables in the dist-hat order."""

    dplan: nd.DistNttPlan
    mono: jax.Array    # (nbits, L, m1, m2): ψ^{E[pos]·2^b mod 2m}
    mono_s: jax.Array

    @property
    def m1(self) -> int:
        return self.dplan.tw.shape[-2]

    @property
    def m2(self) -> int:
        return self.dplan.tw.shape[-1]


def build_rotation_plan(
    moduli: tuple[int, ...], m1: int, m2: int
) -> DistRotationPlan:
    """Host-side construction (exact Python-int arithmetic)."""
    dplan = nd.build_dist_plan(moduli, m1, m2)
    m = m1 * m2
    L = len(moduli)
    br1 = ntt_mod._bit_reverse_indices(m1)
    br2 = ntt_mod._bit_reverse_indices(m2)
    # evaluation exponent per hat position (see module docstring)
    E = (
        1 + 2 * (br1[:, None] + m1 * br2[None, :])
    ) % (2 * m)  # (m1, m2)
    nbits = (2 * m).bit_length() - 1
    mono = np.zeros((nbits, L, m1, m2), dtype=np.uint32)
    mono_s = np.zeros((nbits, L, m1, m2), dtype=np.uint32)
    for li, p in enumerate(moduli):
        psi = pr.root_of_unity(2 * m, p)
        psi_pow = np.zeros(2 * m, dtype=np.uint64)
        cur = 1
        for k in range(2 * m):
            psi_pow[k] = cur
            cur = cur * psi % p
        for b in range(nbits):
            v = psi_pow[(E << b) % (2 * m)]
            mono[b, li] = v.astype(np.uint32)
            mono_s[b, li] = ((v << np.uint64(32)) // p).astype(np.uint32)
    return DistRotationPlan(
        dplan=dplan, mono=jnp.asarray(mono), mono_s=jnp.asarray(mono_s)
    )


def fwd_full(dplan: nd.DistNttPlan, x: jax.Array) -> jax.Array:
    """Unsharded reference of the distributed forward transform: on a single
    device the all_to_all is the identity re-interpretation of the same
    array, so the global result is pre-twist -> m1-NTT -> inter twiddle ->
    m2-NTT. x: (..., L, m1, m2) coefficients (flat index i1*m2 + i2)."""
    p = dplan.plan1.p[..., None]
    x = mm.shoup_mul(x, dplan.pre, dplan.pre_s, p)
    x = nd._ntt_axis(dplan.plan1, x, inverse=False)
    x = mm.shoup_mul(x, dplan.tw, dplan.tw_s, p)
    return nd.fwd_finish(dplan, x)


def inv_full(dplan: nd.DistNttPlan, x: jax.Array) -> jax.Array:
    """Unsharded inverse of `fwd_full`."""
    p = dplan.plan1.p[..., None]
    x = nd.inv_start(dplan, x)
    x = mm.shoup_mul(x, dplan.tw_inv, dplan.tw_inv_s, p)
    x = nd._ntt_axis(dplan.plan1, x, inverse=True)
    return mm.shoup_mul(x, dplan.post, dplan.post_s, p)


def bkey_to_dist(ctx, rplan: DistRotationPlan, bkey_hat, prune: int = 0) -> tuple:
    """Convert a bootstrap key from the single-device merged-NTT hat order
    to the dist-hat order, with fresh Shoup companions: hat -> coefficients
    (ntt_inv) -> four-step hat. One-time setup on the host (the Shoup
    division needs 64-bit integers); returns (hat_dist, shoup_dist) numpy
    arrays of shape (n, 2l, 2, L, m1, m2) ready to be device_put with the
    m1 axis sharded.

    prune > 0 converts (and returns) only the KEPT gadget rows
    [prune, l) + [l+prune, 2l) — shape (n, 2(l-prune), 2, L, m1, m2) —
    halving conversion work and per-chip key share at prune = l/2; pass
    the result to blind_rotate_dist with the same `prune`."""
    m1, m2 = rplan.m1, rplan.m2
    if prune:
        rows2 = bkey_hat.shape[1]
        l = rows2 // 2
        keep = list(range(prune, l)) + list(range(l + prune, rows2))
        bkey_hat = bkey_hat[:, jnp.asarray(keep)]
    coeffs = ntt_mod.ntt_inv(ctx.plan_Q, bkey_hat)
    c = coeffs.reshape(coeffs.shape[:-1] + (m1, m2))
    hat = np.asarray(jax.jit(partial(fwd_full, rplan.dplan))(c))
    moduli = ctx.plan_Q.moduli
    shoup = np.empty_like(hat)
    for li, p in enumerate(moduli):
        shoup[..., li, :, :] = (
            (hat[..., li, :, :].astype(np.uint64) << np.uint64(32)) // p
        ).astype(np.uint32)
    return hat, shoup


def _monomial_mul_dist(mono, mono_s, p, x, u):
    """Hat-domain multiply by x^u via the bit ladder on a LOCAL hat slice.
    mono: (nbits, L, m1_loc, m2); x: (B, ..., L, m1_loc, m2); u: (B,)."""
    u = jnp.asarray(u).astype(jnp.uint32)
    nbits = mono.shape[0]
    cond_shape = u.shape + (1,) * (x.ndim - u.ndim)
    for b in range(nbits):
        y = mm.shoup_mul(x, mono[b], mono_s[b], p)
        bit = ((u >> b) & jnp.uint32(1)).astype(jnp.bool_).reshape(cond_shape)
        x = jnp.where(bit, y, x)
    return x


def blind_rotate_dist(
    params,
    ctx,
    rplan: DistRotationPlan,
    mesh,
    bkey_dist,
    bkey_dist_shoup,
    ua: jax.Array,
    a0: jax.Array,
    b0: jax.Array,
    axis: str = "tp",
    flat_key=None,
    prune: int = 0,
):
    """The n-step blind rotation with the hat axis sharded over `axis`.

    bkey_dist/bkey_dist_shoup: (n_steps, 2l, 2, L, m1, m2) dist-hat key
    (from `bkey_to_dist`), sharded on the m1 axis (in_specs below do it).
    With prune > 0 the key must hold only the kept rows
    (`bkey_to_dist(..., prune=prune)`, 2(l-prune) of them) and the rotation
    runs the approximate-gadget external product — same kept-digit math as
    the single-device kernels, so dist == single-device remains bit-exact
    at equal prune (models/params.prune_error_bound documents the noise).
    ua: (B, n_steps) mod-r exponents; a0, b0: (B, L, m) coefficient-domain
    accumulators (flat layout, same as models/bootstrap.blind_rotate).
    Returns (a_acc, b_acc) as full (B, L, m) arrays, bit-identical to the
    single-device rotation — in BOTH modes: randomized flattening
    (flat_key) draws the same documented Threefry counter stream
    (ops/prg.py) on global (gate, coeff) coordinates, so sharded randomized
    == single-device randomized, bit for bit.
    """
    n_steps = bkey_dist.shape[0]
    l = params.num_digits
    lk = l - prune  # kept digits per operand
    assert bkey_dist.shape[1] == 2 * lk, (
        f"key has {bkey_dist.shape[1]} gadget rows; prune={prune} needs "
        f"{2 * lk} (use bkey_to_dist(..., prune={prune}))"
    )
    if prune:
        from ..models.params import prune_error_bound

        bound = prune_error_bound(params, prune)
        assert bound < params.Dr / 16, (
            f"digit pruning prune={prune} admits post-rescale noise "
            f"{bound:.3g} vs the Dr/16 guard {params.Dr / 16:.3g}"
        )
    L = params.num_limbs
    m1, m2 = rplan.m1, rplan.m2
    m = m1 * m2
    assert m == params.m, (m, params.m)
    D = mesh.shape[axis]
    assert m1 % D == 0 and m2 % D == 0, (m1, m2, D)
    m1_loc, m2_loc = m1 // D, m2 // D
    rns = ctx.rns
    dplan = rplan.dplan
    p3 = dplan.plan1.p[..., None]  # (L, 1, 1)
    seed2 = None if flat_key is None else rns_mod.seed_words(flat_key)

    def body(ua, a0, b0, bk, bks):
        idx = jax.lax.axis_index(axis)

        def flatten_local(x, step, op):
            """(B, L, m1, m2_loc) -> digits: flatten is per-coefficient, so
            the sharded layout flattens locally; randomized masks use the
            GLOBAL coefficient counter gate*m + i1*m2 + idx*m2_loc + j."""
            B = x.shape[0]
            m2l = x.shape[-1]
            flat = x.reshape(B, L, m1 * m2l)
            if seed2 is None:
                d = rns_mod.flatten(rns, flat, prune)  # (B, lk, L, M_loc)
            else:
                g = jnp.arange(B, dtype=jnp.uint32)[:, None, None]
                i1 = jnp.arange(m1, dtype=jnp.uint32)[None, :, None]
                j = jnp.arange(m2l, dtype=jnp.uint32)[None, None, :]
                c0 = (
                    g * jnp.uint32(m)
                    + i1 * jnp.uint32(m2)
                    + idx.astype(jnp.uint32) * jnp.uint32(m2_loc)
                    + j
                ).reshape(B, m1 * m2l)
                d = rns_mod.flatten_random(
                    rns, flat, params.moduli, seed2, step, op=op, c0=c0,
                    prune=prune,
                )
            return d.reshape(B, lk, L, m1, m2l)

        def fwd(x):
            x = nd.fwd_local_dyn(dplan, x, idx, m2_loc)
            x = jax.lax.all_to_all(
                x, axis, split_axis=x.ndim - 2, concat_axis=x.ndim - 1,
                tiled=True,
            )
            return nd.fwd_finish(dplan, x)

        def inv(x):
            x = nd.inv_start(dplan, x)
            x = jax.lax.all_to_all(
                x, axis, split_axis=x.ndim - 1, concat_axis=x.ndim - 2,
                tiled=True,
            )
            return nd.inv_finish_dyn(dplan, x, idx, m2_loc)

        mono_l = jax.lax.dynamic_slice_in_dim(
            rplan.mono, idx * m1_loc, m1_loc, axis=-2
        )
        mono_sl = jax.lax.dynamic_slice_in_dim(
            rplan.mono_s, idx * m1_loc, m1_loc, axis=-2
        )

        def step(k, carry):
            a_acc, b_acc = carry  # (B, L, m1, m2_loc)
            da = flatten_local(a_acc, k, 0)
            db = flatten_local(b_acc, k, 1)
            digits = jnp.concatenate([da, db], axis=1)  # (B, 2lk, L, m1, m2l)
            d_hat = fwd(digits)                         # (B, 2l, L, m1l, m2)
            ck = jax.lax.dynamic_index_in_dim(bk, k, 0, keepdims=False)
            cks = jax.lax.dynamic_index_in_dim(bks, k, 0, keepdims=False)
            u_k = jax.lax.dynamic_index_in_dim(ua, k, 1, keepdims=False)
            outs = []
            for c in range(2):
                s_acc = None
                t_acc = None
                # pre-sliced key: its row r IS kept-digit row r
                for row in range(2 * lk):
                    prod = mm.shoup_mul(
                        d_hat[:, row], ck[row, c], cks[row, c], p3
                    )
                    s_acc = (
                        prod if s_acc is None else mm.addmod(s_acc, prod, p3)
                    )
                for i in range(lk):
                    row = i if c == 0 else lk + i
                    wprod = mm.shoup_mul(
                        d_hat[:, row],
                        rns.w_val[prune + i][..., None],
                        rns.w_shoup[prune + i][..., None],
                        p3,
                    )
                    t_acc = (
                        wprod if t_acc is None else mm.addmod(t_acc, wprod, p3)
                    )
                rot = _monomial_mul_dist(mono_l, mono_sl, p3, s_acc, u_k)
                outs.append(
                    mm.addmod(mm.submod(rot, s_acc, p3), t_acc, p3)
                )
            back = inv(jnp.stack(outs, axis=1))  # (B, 2, L, m1, m2_loc)
            return back[:, 0], back[:, 1]

        a_acc, b_acc = jax.lax.fori_loop(0, n_steps, step, (a0, b0))
        ga = jax.lax.all_gather(a_acc, axis, axis=a_acc.ndim - 1, tiled=True)
        gb = jax.lax.all_gather(b_acc, axis, axis=b_acc.ndim - 1, tiled=True)
        B = ga.shape[0]
        return ga.reshape(B, L, m), gb.reshape(B, L, m)

    B = ua.shape[0]
    a0 = a0.reshape(B, L, m1, m2)
    b0 = b0.reshape(B, L, m1, m2)
    coeff = P(None, None, None, axis)
    key_spec = P(None, None, None, None, axis, None)
    return shard_map(
        body,
        mesh=mesh,
        in_specs=(P(None, None), coeff, coeff, key_spec, key_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )(ua, a0, b0, bkey_dist, bkey_dist_shoup)


def bootstrap_internal_dist(
    params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup,
    a1, b1, a2, b2, axis: str = "tp", flat_key=None, prune: int = 0,
):
    """Gate bootstrap (blind rotation + AND/OR/XOR extraction) on the
    tp-sharded rotation — the production entry for keys that span chips
    (mirrors models/bootstrap.bootstrap_internal, src/fhe.jl:559-595).
    flat_key: optional PRNG key for randomized flattening (same documented
    Threefry stream as the single-device path, so outputs stay bit-identical
    to bootstrap_internal in both modes)."""
    from ..ops import poly as pol
    from ..ops import ntt as ntt_mod2

    n, m, L = params.n, params.m, params.num_limbs
    mask = jnp.uint32(params.mask_r)
    plan = ctx.plan_Q

    ua = (a1 + a2) & mask
    ub = (b1 + b2) & mask
    batch = ua.shape[0]
    tpoly_hat_b = jnp.broadcast_to(ctx.tpoly_dq_hat, (batch, L, m))
    shift = (jnp.uint32(2 * m) - ub) & jnp.uint32(2 * m - 1)
    b_acc = ntt_mod2.ntt_inv(
        plan, ntt_mod2.monomial_mul_hat(plan, tpoly_hat_b, shift)
    )
    a_acc = jnp.zeros((batch, L, m), dtype=jnp.uint32)

    a_acc, b_acc = blind_rotate_dist(
        params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup,
        ua, a_acc, b_acc, axis=axis, flat_key=flat_key, prune=prune,
    )

    i_and = 3 * m // 4
    i_or = m // 4
    p = plan.p
    a_and = pol.extract(a_acc, i_and, n, p)
    b_and = mm.addmod(ctx.dq_tilde[:, 0], b_acc[..., i_and], p[:, 0])
    a_or = mm.negmod(pol.extract(a_acc, i_or, n, p), p)
    b_or = mm.submod(ctx.dq_tilde[:, 0], b_acc[..., i_or], p[:, 0])
    a_xor = mm.submod(a_or, a_and, p)
    b_xor = mm.submod(b_or, b_and, p[:, 0])
    return (a_and, b_and), (a_or, b_or), (a_xor, b_xor)


def bootstrap_batch_tp(
    params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup,
    lwe1, lwe2, axis: str = "tp", flat_key=None, epoch: "int | None" = None,
    prune: int = 0,
):
    """Batched scheme-1 gate bootstrap over the tp-sharded rotation,
    returning (AND, OR, XOR) LWE batches mod r — the public tensor-parallel
    twin of models/bootstrap.bootstrap_batch for bootstrap keys that span
    chips (reference hot loop src/fhe.jl:559-621). Bit-identical to the
    single-device bootstrap_batch in both flattening modes
    (tests/test_rotate_dist.py)."""
    from ..models import bootstrap as bs
    from ..ops import prg

    if flat_key is not None:
        flat_key = prg.fold_epoch(flat_key, epoch)
    triple = bootstrap_internal_dist(
        params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup,
        lwe1.a, lwe1.b, lwe2.a, lwe2.b, axis=axis, flat_key=flat_key,
        prune=prune,
    )
    return tuple(bs._reduce_lwe(params, ctx, t) for t in triple)


def rotate_extract_dist(
    params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup,
    ua, ub, t0, axis: str = "tp", flat_key=None, prune: int = 0,
):
    """Scheme-2 functional rotate-and-extract on the tp-sharded rotation
    (mirrors models/bootstrap2._rotate_extract): rotate each lane's own
    NTT-domain test vector t0 by its phase, extract coefficient 0, exact
    Q->r switch. This is the entry the k >= 3 parameter sets use when the
    bootstrap key exceeds one chip's HBM (reference src/fhe2.jl:36-39)."""
    from ..ops import poly as pol

    n, m = params.n, params.m
    plan = ctx.plan_Q
    M = ua.shape[0]
    shift = (jnp.uint32(2 * m) - ub) & jnp.uint32(2 * m - 1)
    b_acc = ntt_mod.ntt_inv(plan, ntt_mod.monomial_mul_hat(plan, t0, shift))
    a_acc = jnp.zeros((M, params.num_limbs, m), dtype=jnp.uint32)
    a_acc, b_acc = blind_rotate_dist(
        params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup,
        ua, a_acc, b_acc, axis=axis, flat_key=flat_key, prune=prune,
    )
    p = plan.p
    a_q = pol.extract(a_acc, 0, n, p)
    b_q = b_acc[..., 0]
    a_r = rns_mod.rescale_exact(ctx.rns_Q, a_q, params.r, params.moduli)
    b_r = rns_mod.rescale_exact(
        ctx.rns_Q, b_q[..., None], params.r, params.moduli
    )[..., 0]
    from ..models.scheme1 import LWE

    return LWE(a_r, b_r)


def bootstrap2_dist(
    params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup,
    lwe_u, t_hats, axis: str = "tp", flat_key=None,
    epoch: "int | None" = None, prune: int = 0,
):
    """Scheme-2 functional bootstrap over the tp-sharded rotation: evaluate
    F functions of each lane's phase (models/bootstrap2.bootstrap with the
    key spanning the mesh). Folds a per-call epoch into flat_key exactly
    like the single-device entry (ops/prg.py), so dist == single-device
    bit-for-bit at the same (flat_key, epoch)."""
    from ..models.scheme1 import LWE
    from ..ops import prg

    if flat_key is not None:
        flat_key = prg.fold_epoch(flat_key, epoch)

    B = lwe_u.a.shape[0]
    Fn = t_hats.shape[0]
    ua = jnp.repeat(lwe_u.a, Fn, axis=0)
    ub = jnp.repeat(lwe_u.b, Fn, axis=0)
    t0 = jnp.tile(t_hats, (B, 1, 1))
    out = rotate_extract_dist(
        params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup, ua, ub, t0,
        axis=axis, flat_key=flat_key, prune=prune,
    )
    n = params.n
    return LWE(out.a.reshape(B, Fn, n), out.b.reshape(B, Fn))


def add_with_carry_dist(
    params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup,
    lwe1, lwe2, carry=None, axis: str = "tp", flat_key=None,
    epoch: "int | None" = None, prune: int = 0,
):
    """k-bit add-with-carry through the sharded rotation — one rotation pass,
    digit and carry as adjacent lanes (models/bootstrap2.add_with_carry)."""
    from ..models import bootstrap2 as bs2
    from ..models.scheme1 import LWE

    k = params.k
    zmax = 2 ** (k + 1)
    u = (
        bs2._lwe_sum(params, lwe1, lwe2)
        if carry is None
        else bs2._lwe_sum(params, lwe1, lwe2, carry)
    )
    digit_tab = [z % 2**k for z in range(zmax)]
    carry_tab = [1 if z >= 2**k else 0 for z in range(zmax)]
    th = bs2.tables_hat(params, ctx, [digit_tab, carry_tab])
    out = bootstrap2_dist(
        params, ctx, rplan, mesh, bkey_dist, bkey_dist_shoup, u, th,
        axis=axis, flat_key=flat_key, epoch=epoch, prune=prune,
    )
    digit = LWE(out.a[:, 0], out.b[:, 0])
    cout = LWE(out.a[:, 1], out.b[:, 1])
    return digit, cout
