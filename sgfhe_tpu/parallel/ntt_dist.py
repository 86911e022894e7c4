"""Distributed four-step negacyclic NTT over the 'tp' mesh axis.

The sequence-parallel analog for this workload (SURVEY.md §2.4): when a
single transform of length m = m1*m2 spans chips, each device holds a column
slice, does a local length-m1 transform, applies the inter-stage twiddles,
exchanges blocks via `all_to_all` over ICI, and finishes with a local
length-m2 transform — the Bailey decomposition with the sub-transforms'
bit-reversed ordering folded into precomputed twiddle matrices.

Layout contract: coefficient-domain input is (..., L, m1, m2) with the LAST
axis sharded over 'tp'; hat-domain output is (..., L, m1, m2) with the m1
(pos1) axis sharded. Forward-then-inverse returns the input layout, and two
forward outputs multiply pointwise (the global position permutation
k = br1(pos1) + m1*br2(pos2) is consistent).
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
from ..utils import primes as pr


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistNttPlan:
    plan1: ntt_mod.NttPlan   # cyclic, length m1
    plan2: ntt_mod.NttPlan   # cyclic, length m2
    tw: jax.Array            # (L, m1, m2): ω^{br1(pos1)·i2}
    tw_s: jax.Array
    tw_inv: jax.Array        # (L, m1, m2): ω^{-br1(pos1)·i2}
    tw_inv_s: jax.Array
    pre: jax.Array           # (L, m1, m2): ψ^{i1·m2+i2}
    pre_s: jax.Array
    post: jax.Array          # (L, m1, m2): ψ^{-(i1·m2+i2)}
    post_s: jax.Array


def build_dist_plan(moduli: tuple[int, ...], m1: int, m2: int) -> DistNttPlan:
    m = m1 * m2
    L = len(moduli)
    plan1 = ntt_mod.build_plan(moduli, m1, negacyclic=False)
    plan2 = ntt_mod.build_plan(moduli, m2, negacyclic=False)
    br1 = ntt_mod._bit_reverse_indices(m1)

    tw = np.zeros((L, m1, m2), dtype=np.uint32)
    twi = np.zeros((L, m1, m2), dtype=np.uint32)
    pre = np.zeros((L, m1, m2), dtype=np.uint32)
    post = np.zeros((L, m1, m2), dtype=np.uint32)
    for li, p in enumerate(moduli):
        assert (p - 1) % (2 * m) == 0
        psi = pr.root_of_unity(2 * m, p)
        omega = psi * psi % p
        inv_omega = pr.inv_mod(omega, p)
        inv_psi = pr.inv_mod(psi, p)
        for pos1 in range(m1):
            k1 = int(br1[pos1])
            wrow = pow(omega, k1, p)
            wirow = pow(inv_omega, k1, p)
            cur, curi = 1, 1
            for i2 in range(m2):
                tw[li, pos1, i2] = cur
                twi[li, pos1, i2] = curi
                cur = cur * wrow % p
                curi = curi * wirow % p
        for i1 in range(m1):
            for i2 in range(m2):
                e = i1 * m2 + i2
                pre[li, i1, i2] = pow(psi, e, p)
                post[li, i1, i2] = pow(inv_psi, e, p)

    def sh(vals):
        out = np.empty_like(vals)
        for li, p in enumerate(moduli):
            out[li] = (
                (vals[li].astype(np.uint64) << np.uint64(32)) // p
            ).astype(np.uint32)
        return out

    return DistNttPlan(
        plan1=plan1, plan2=plan2,
        tw=jnp.asarray(tw), tw_s=jnp.asarray(sh(tw)),
        tw_inv=jnp.asarray(twi), tw_inv_s=jnp.asarray(sh(twi)),
        pre=jnp.asarray(pre), pre_s=jnp.asarray(sh(pre)),
        post=jnp.asarray(post), post_s=jnp.asarray(sh(post)),
    )


def _ntt_axis(plan, x, inverse: bool):
    """Transform along axis -2 of (..., L, t, other) is awkward; this helper
    transforms axis -1 of (..., L, A, B) arrays along B? No: it transforms
    the SECOND-to-last data axis by moving it last, keeping limbs at -2."""
    # x: (..., L, t_axis, rest) -> move rest before L: (..., rest, L, t_axis)
    xt = jnp.moveaxis(x, -1, -3)  # (..., rest, L, t)
    yt = ntt_mod.ntt_inv(plan, xt) if inverse else ntt_mod.ntt_fwd(plan, xt)
    return jnp.moveaxis(yt, -3, -1)


def fwd_finish(plan: DistNttPlan, x: jax.Array) -> jax.Array:
    """Post-all_to_all: x (..., L, m1_loc, m2) -> transform the m2 axis."""
    # here m2 is the LAST axis and limbs at -3: ntt_fwd wants (..., L, m2)
    xt = jnp.moveaxis(x, -2, -3)  # (..., m1_loc, L, m2)
    yt = ntt_mod.ntt_fwd(plan.plan2, xt)
    return jnp.moveaxis(yt, -3, -2)


def inv_start(plan: DistNttPlan, x: jax.Array) -> jax.Array:
    xt = jnp.moveaxis(x, -2, -3)
    yt = ntt_mod.ntt_inv(plan.plan2, xt)
    return jnp.moveaxis(yt, -3, -2)


def make_dist_polymul(plan: DistNttPlan, mesh, axis: str = "tp"):
    """Returns a shard_map'd negacyclic polymul over (..., L, m1, m2) arrays
    sharded on the last axis — a full demonstration of the multi-chip NTT
    (two all_to_alls per transform direction, six total)."""
    D = mesh.shape[axis]

    # arrays are (..., L, m1, m2): shard last axis
    def spec_for(x):
        return P(*([None] * (x.ndim - 1)), axis)

    def body(a, b):
        idx = jax.lax.axis_index(axis)
        m2 = plan.tw.shape[-1]
        m2_loc = m2 // D

        def fwd(x):
            x = fwd_local_dyn(plan, x, idx, m2_loc)
            x = jax.lax.all_to_all(
                x, axis, split_axis=x.ndim - 2, concat_axis=x.ndim - 1,
                tiled=True,
            )
            return fwd_finish(plan, x)

        a_hat = fwd(a)
        b_hat = fwd(b)
        p1 = plan.plan1
        p3 = p1.p[..., None]
        prod = mm.mulmod(
            a_hat, b_hat, p3, p1.mu[..., None], p1.r_mod_p[..., None],
            p1.r_shoup[..., None],
        )
        y = inv_start(plan, prod)
        y = jax.lax.all_to_all(
            y, axis, split_axis=y.ndim - 1, concat_axis=y.ndim - 2, tiled=True
        )
        return inv_finish_dyn(plan, y, idx, m2_loc)

    def run(a, b):
        sa = spec_for(a)
        return shard_map(
            body, mesh=mesh, in_specs=(sa, sa), out_specs=sa, check_vma=False
        )(a, b)

    return run


def _dyn_cols(tbl, idx, m2_loc):
    return jax.lax.dynamic_slice_in_dim(tbl, idx * m2_loc, m2_loc, axis=-1)


def fwd_local_dyn(plan, x, idx, m2_loc):
    p = plan.plan1.p[..., None]
    x = mm.shoup_mul(
        x, _dyn_cols(plan.pre, idx, m2_loc), _dyn_cols(plan.pre_s, idx, m2_loc), p
    )
    x = _ntt_axis(plan.plan1, x, inverse=False)
    x = mm.shoup_mul(
        x, _dyn_cols(plan.tw, idx, m2_loc), _dyn_cols(plan.tw_s, idx, m2_loc), p
    )
    return x


def inv_finish_dyn(plan, x, idx, m2_loc):
    p = plan.plan1.p[..., None]
    x = mm.shoup_mul(
        x,
        _dyn_cols(plan.tw_inv, idx, m2_loc),
        _dyn_cols(plan.tw_inv_s, idx, m2_loc),
        p,
    )
    x = _ntt_axis(plan.plan1, x, inverse=True)
    x = mm.shoup_mul(
        x,
        _dyn_cols(plan.post, idx, m2_loc),
        _dyn_cols(plan.post_s, idx, m2_loc),
        p,
    )
    return x
