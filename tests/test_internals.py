"""Internals property tests mirroring reference test/internals.test.jl:

 - external-product identity: (a, b) ⊙ G == (a, b) exactly
   (test/internals.test.jl:144-166) — in our formulation, flatten followed by
   the gadget-weight recombination must reproduce the inputs bit-exactly.
 - extract/monomial consistency at the LWE boundary.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.ops import modmath as mm, ntt as ntt_mod, rns as rns_mod


@pytest.fixture(scope="module")
def small():
    params = F.Params.create(64)
    ctx = F.make_context(params)
    return params, ctx


def test_external_product_gadget_identity(small):
    """⊙ with A = G is the identity: sum_i w_i * flatten(x)_i == x."""
    params, ctx = small
    rns = ctx.rns
    plan = ctx.plan_Q
    L, m = params.num_limbs, params.m
    key = jax.random.key(0)
    keys = jax.random.split(key, L)
    x = jnp.stack(
        [
            jax.random.randint(keys[i], (4, m), 0, p, dtype=jnp.int32).astype(
                jnp.uint32
            )
            for i, p in enumerate(params.moduli)
        ],
        axis=-2,
    )  # (4, L, m)
    d = rns_mod.flatten(rns, x)  # (4, l, L, m)
    acc = None
    for i in range(params.num_digits):
        t = mm.shoup_mul(d[:, i], rns.w_val[i], rns.w_shoup[i], plan.p)
        acc = t if acc is None else mm.addmod(acc, t, plan.p)
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(x))


def test_external_product_gadget_identity_randomized(small):
    params, ctx = small
    rns = ctx.rns
    plan = ctx.plan_Q
    L, m = params.num_limbs, params.m
    x = jnp.stack(
        [
            jax.random.randint(
                jax.random.key(i), (2, m), 0, p, dtype=jnp.int32
            ).astype(jnp.uint32)
            for i, p in enumerate(params.moduli)
        ],
        axis=-2,
    )
    d = rns_mod.flatten_random(
        rns, x, params.moduli, rns_mod.seed_words(jax.random.key(42)), 0
    )
    acc = None
    for i in range(params.num_digits):
        t = mm.shoup_mul(d[:, i], rns.w_val[i], rns.w_shoup[i], plan.p)
        acc = t if acc is None else mm.addmod(acc, t, plan.p)
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(x))


def test_hat_domain_identity_through_plans(small):
    """NTT of digits, recombined in hat domain, inverted == original — the
    path the bootstrap actually takes."""
    params, ctx = small
    rns = ctx.rns
    plan = ctx.plan_Q
    m = params.m
    x = jnp.stack(
        [
            jax.random.randint(
                jax.random.key(7 + i), (m,), 0, p, dtype=jnp.int32
            ).astype(jnp.uint32)
            for i, p in enumerate(params.moduli)
        ],
        axis=-2,
    )
    d = rns_mod.flatten(rns, x)
    d_hat = ntt_mod.ntt_fwd(plan, d)
    acc = None
    for i in range(params.num_digits):
        t = mm.shoup_mul(d_hat[i], rns.w_val[i], rns.w_shoup[i], plan.p)
        acc = t if acc is None else mm.addmod(acc, t, plan.p)
    back = ntt_mod.ntt_inv(plan, acc)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
