"""The fused Pallas blind-rotation kernel (ops/fused.py) must match the jnp
reference path bit-for-bit. Runs in interpreter mode on the CPU backend; the
same kernel compiles natively on TPU (exercised by bench.py / the driver)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.models import bootstrap as bs
from sgfhe_tpu.ops import ntt as ntt_mod
from sgfhe_tpu.ops import fused as fm


@pytest.fixture(scope="module")
def setup64():
    params = F.Params.create(64)
    ctx = F.make_context(params)
    key = jax.random.key(77)
    k_sk, k_bk = jax.random.split(key)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)
    return params, ctx, sk, bkey


def test_roll_ntt_matches_plan_ntt(setup64):
    params, ctx, _, _ = setup64
    plan, ft = ctx.plan_Q, ctx.fused
    x = jax.random.randint(
        jax.random.key(3), (3, params.num_limbs, params.m), 0, 1 << 29,
        dtype=jnp.int32,
    ).astype(jnp.uint32) % plan.p
    ref = ntt_mod.ntt_fwd(plan, x)
    got = fm.ntt_fwd_roll(
        x, plan.pre_tw, plan.pre_tw_s, ft.fwd_full, ft.fwd_full_s, ft.lane,
        plan.p, params.m,
    )
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
    back = fm.ntt_inv_roll(
        got, plan.post_tw, plan.post_tw_s, ft.inv_full, ft.inv_full_s, ft.lane,
        plan.p, params.m,
    )
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_fused_rotation_matches_jnp(setup64):
    params, ctx, sk, bkey = setup64
    k_a, k_b = jax.random.split(jax.random.key(5))
    B = 4
    a1 = jax.random.randint(
        k_a, (B, params.n), 0, params.r, dtype=jnp.int32
    ).astype(jnp.uint32)
    a2 = jax.random.randint(
        k_b, (B, params.n), 0, params.r, dtype=jnp.int32
    ).astype(jnp.uint32)
    b1, b2 = a1[:, 3], a2[:, 5]
    ref = bs.bootstrap_internal(
        params, ctx, bkey.hat, bkey.hat_shoup, a1, b1, a2, b2, None,
        fused=("none", False),
    )
    got = bs.bootstrap_internal(
        params, ctx, bkey.hat, bkey.hat_shoup, a1, b1, a2, b2, None,
        fused=("resident", True),  # Pallas kernel, interpreter mode
    )
    for (ra, rb), (ga, gb) in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))
        np.testing.assert_array_equal(np.asarray(rb), np.asarray(gb))
    got_s = bs.bootstrap_internal(
        params, ctx, bkey.hat, bkey.hat_shoup, a1, b1, a2, b2, None,
        fused=("streamed", True),  # HBM-streamed key variant
    )
    for (ra, rb), (ga, gb) in zip(ref, got_s):
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))
        np.testing.assert_array_equal(np.asarray(rb), np.asarray(gb))
