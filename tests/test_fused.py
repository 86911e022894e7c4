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


@pytest.mark.parametrize("m", [512, 4096])
def test_tiled_lazy_ntt_matches_plan_ntt(m):
    """The kernel's 2-D tiled lazy NTT must agree with ops/ntt (mod p) at
    both the resident size (m=512) and the Params(512) size (m=4096)."""
    from sgfhe_tpu.utils import primes as pr

    mods = pr.find_rns_primes(2 * m, 1 << 54, 1 << 56, 2)
    plan = ntt_mod.build_plan(mods, m)
    ft = fm.build_fused(plan)
    L = len(mods)
    m1, m2 = fm._split_m(m)
    B = 8
    x = jax.random.randint(
        jax.random.key(3), (B, L, m), 0, 1 << 29, dtype=jnp.int32
    ).astype(jnp.uint32) % plan.p

    xk = fm._to_kernel_layout(x, L, m1, m2)   # (L, m1, B, m2)
    tw2 = lambda t: t.reshape(L, m1, 1, m2)   # noqa: E731
    tws2 = lambda t: t.reshape(t.shape[0], L, m1, 1, m2)  # noqa: E731
    p4 = plan.p[:, :, None, None]
    mu4 = plan.mu[:, :, None, None]
    p_max = max(mods)

    hat_lazy, c = fm._ntt_fwd_lazy(
        xk, tws2(ft.fwd_full), tws2(ft.fwd_full_s), p4, mu4, p_max, m1, m2,
    )
    hat = fm._from_kernel_layout(
        fm.mm.mod_u32(hat_lazy, p4, mu4), L, m1, m2
    )
    ref = ntt_mod.ntt_fwd(plan, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(hat))

    back = fm._ntt_inv_lazy(
        fm.mm.mod_u32(hat_lazy, p4, mu4),
        tw2(plan.post_tw), tw2(plan.post_tw_s),
        tws2(ft.inv_full), tws2(ft.inv_full_s), p4, mu4, 1, p_max, m1, m2,
    )
    back = fm._from_kernel_layout(back, L, m1, m2)
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


def test_fused_randomized_mode(setup64):
    """Randomized flattening inside the kernel (in-kernel PRNG masks): the
    output must decrypt to correct gates, be deterministic given the key,
    and differ from the deterministic-mode ciphertext (masks present)."""
    params, ctx, sk, bkey = setup64
    msg = np.asarray(jax.random.bernoulli(jax.random.key(8), 0.5, (params.n,)))
    ct = F.encrypt(sk, jax.random.key(9), jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    B = 8
    lwe1 = F.LWE(bits.lwe.a[0 : 2 * B : 2], bits.lwe.b[0 : 2 * B : 2])
    lwe2 = F.LWE(bits.lwe.a[1 : 2 * B : 2], bits.lwe.b[1 : 2 * B : 2])
    fk = jax.random.key(11)
    run = lambda fused, key: bs._bootstrap_batch_jit(  # noqa: E731
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, key,
        key is not None, fused,
    )
    out_r = run(("resident", True), fk)
    out_r2 = run(("resident", True), fk)
    out_det = run(("resident", True), None)
    y1, y2 = msg[0 : 2 * B : 2], msg[1 : 2 * B : 2]
    exp = [y1 & y2, y1 | y2, y1 ^ y2]
    for lwe, e in zip(out_r, exp):
        got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(lwe)))
        np.testing.assert_array_equal(got, e)
    # deterministic given the key
    for a, b in zip(out_r, out_r2):
        np.testing.assert_array_equal(np.asarray(a.a), np.asarray(b.a))
        np.testing.assert_array_equal(np.asarray(a.b), np.asarray(b.b))
    # masks actually applied (ciphertext differs from deterministic mode)
    assert not (np.asarray(out_r[0].a) == np.asarray(out_det[0].a)).all()

    out_s = run(("streamed", True), fk)
    for lwe, e in zip(out_s, exp):
        got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(lwe)))
        np.testing.assert_array_equal(got, e)


def test_fused_rotation_big_limbs_reset_paths():
    """Near-2^29 limbs with l = 3 force EVERY lazy-reduction reset in the
    fused kernels: the mid-accumulation Barrett reset (12*p_max > 2^32), the
    pre-ladder reset that leaves cs == 1 (the round-2 advisor's
    Params(1024)-class bound-accounting finding), and the inverse-NTT resets
    driven by the corrected c_in. Run at n=64/m=512 (synthetic moduli) so
    interpret mode stays cheap; fused must match the canonical jnp path
    bit-for-bit on both kernel variants."""
    import dataclasses

    from sgfhe_tpu.utils import primes as pr

    base = F.Params.create(64)
    mods = pr.find_rns_primes(2 * base.m, 1 << 86, (1 << 87) - 1, 3)
    p_max = max(mods)
    assert 12 * p_max > (1 << 32), "moduli too small to exercise the resets"
    assert 7 * p_max <= (1 << 32) - 1
    params = dataclasses.replace(base, moduli=mods)
    ctx = F.make_context(params)
    k_sk, k_bk, k_a, k_b = jax.random.split(jax.random.key(21), 4)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)
    B = 4
    a1 = jax.random.randint(
        k_a, (B, params.n), 0, params.r, dtype=jnp.int32
    ).astype(jnp.uint32)
    a2 = jax.random.randint(
        k_b, (B, params.n), 0, params.r, dtype=jnp.int32
    ).astype(jnp.uint32)
    b1, b2 = a1[:, 7], a2[:, 2]
    ref = bs.bootstrap_internal(
        params, ctx, bkey.hat, bkey.hat_shoup, a1, b1, a2, b2, None,
        fused=("none", False),
    )
    for kernel in ("resident", "streamed"):
        got = bs.bootstrap_internal(
            params, ctx, bkey.hat, bkey.hat_shoup, a1, b1, a2, b2, None,
            fused=(kernel, True),
        )
        for (ra, rb), (ga, gb) in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))
            np.testing.assert_array_equal(np.asarray(rb), np.asarray(gb))


def test_randomized_bit_exact_across_paths(setup64):
    """The round-4 oracle for randomized mode: the fused kernels and the jnp
    path draw the SAME documented Threefry-2x32 mask stream (ops/prg.py), so
    with the same flat_key ALL THREE paths must agree bit-for-bit — a
    masked-arithmetic bug that only preserved correctness mod r would show
    here (this was unverifiable while the two paths used different PRNGs)."""
    params, ctx, sk, bkey = setup64
    k_a, k_b = jax.random.split(jax.random.key(31))
    B = 4
    a1 = jax.random.randint(
        k_a, (B, params.n), 0, params.r, dtype=jnp.int32
    ).astype(jnp.uint32)
    a2 = jax.random.randint(
        k_b, (B, params.n), 0, params.r, dtype=jnp.int32
    ).astype(jnp.uint32)
    b1, b2 = a1[:, 1], a2[:, 4]
    fk = jax.random.key(13)
    ref = bs.bootstrap_internal(
        params, ctx, bkey.hat, bkey.hat_shoup, a1, b1, a2, b2, fk,
        fused=("none", False),
    )
    for kernel in ("resident", "streamed"):
        got = bs.bootstrap_internal(
            params, ctx, bkey.hat, bkey.hat_shoup, a1, b1, a2, b2, fk,
            fused=(kernel, True),
        )
        for (ra, rb), (ga, gb) in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))
            np.testing.assert_array_equal(np.asarray(rb), np.asarray(gb))
