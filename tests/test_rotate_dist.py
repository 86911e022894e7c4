"""Tensor-parallel blind rotation (parallel/rotate_dist.py): the four-step
hat order must be a pure negacyclic evaluation map with the documented
exponent map E, and the sharded rotation must be BIT-IDENTICAL to the
single-device jnp path at m = 8192 on the 8-device CPU mesh (VERDICT round-3
item 1's acceptance bar)."""

import numpy as np
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.models import bootstrap as bs
from sgfhe_tpu.models.scheme1 import _shoup_companion
from sgfhe_tpu.ops import ntt as ntt_mod
from sgfhe_tpu.parallel import mesh as mesh_mod
from sgfhe_tpu.parallel import rotate_dist as rd
from sgfhe_tpu.utils import primes as pr


def test_fwd_full_eval_map_and_roundtrip():
    """fwd_full evaluates P at ψ^{E[pos]} with E = 1 + 2*(br1(pos1) +
    m1*br2(pos2)); inv_full inverts it; products match ntt polymul."""
    m1, m2 = 8, 16
    m = m1 * m2
    mods = pr.find_rns_primes(2 * m, 1 << 27, 1 << 29, 2)
    rplan = rd.build_rotation_plan(mods, m1, m2)
    L = len(mods)

    br1 = ntt_mod._bit_reverse_indices(m1)
    br2 = ntt_mod._bit_reverse_indices(m2)
    E = (1 + 2 * (br1[:, None] + m1 * br2[None, :])) % (2 * m)

    rng = np.random.default_rng(3)
    for j in (0, 1, 5, m - 1):
        x = np.zeros((L, m1, m2), dtype=np.uint32)
        x.reshape(L, m)[:, j] = 1  # monomial x^j
        hat = np.asarray(rd.fwd_full(rplan.dplan, jnp.asarray(x)))
        for li, p in enumerate(mods):
            psi = pr.root_of_unity(2 * m, p)
            expect = np.array(
                [[pow(psi, int(E[i1, i2]) * j, p) for i2 in range(m2)]
                 for i1 in range(m1)],
                dtype=np.uint32,
            )
            np.testing.assert_array_equal(hat[li], expect)

    # roundtrip + product consistency on random polys
    a = rng.integers(0, min(mods), size=(L, m1, m2), dtype=np.uint32)
    b = rng.integers(0, min(mods), size=(L, m1, m2), dtype=np.uint32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    back = np.asarray(rd.inv_full(rplan.dplan, rd.fwd_full(rplan.dplan, aj)))
    np.testing.assert_array_equal(back, a)
    plan = ntt_mod.build_plan(mods, m)
    ref = np.asarray(
        ntt_mod.polymul(plan, aj.reshape(L, m), bj.reshape(L, m))
    )
    ha = rd.fwd_full(rplan.dplan, aj)
    hb = rd.fwd_full(rplan.dplan, bj)
    prod = ntt_mod.pointwise_mul(
        # pointwise in dist-hat order: (L, m1, m2) with p (L,1,1)
        rplan.dplan.plan1,
        ha.reshape(L, m),
        hb.reshape(L, m),
    )
    got = np.asarray(
        rd.inv_full(rplan.dplan, prod.reshape(L, m1, m2))
    ).reshape(L, m)
    np.testing.assert_array_equal(got, ref)


def _synthetic_key(params, ctx, n_steps, key):
    """A truncated bootstrap key with random (not GSW-valid) entries — the
    rotation's bit-exactness does not depend on key validity."""
    L, m, l = params.num_limbs, params.m, params.num_digits
    c = jax.random.randint(
        key, (n_steps, 2 * l, 2, L, m), 0, min(params.moduli),
        dtype=jnp.int32,
    ).astype(jnp.uint32)
    hat = ntt_mod.ntt_fwd(ctx.plan_Q, c)
    shoup = _shoup_companion(np.asarray(hat), params.moduli)
    return hat, jnp.asarray(shoup)


def test_blind_rotate_dist_bit_exact_m8192():
    """m = 8192 (Params(1024)) across the 8-device CPU mesh, truncated
    4-step key: dist rotation == single-device jnp rotation, bit for bit."""
    params = F.Params.create(1024)
    ctx = F.make_context(params)
    n_steps, B = 4, 2
    bkey_hat, bkey_shoup = _synthetic_key(params, ctx, n_steps, jax.random.key(5))

    k_u, k_a, k_b = jax.random.split(jax.random.key(9), 3)
    ua = jax.random.randint(
        k_u, (B, n_steps), 0, params.r, dtype=jnp.int32
    ).astype(jnp.uint32)
    a0 = jax.random.randint(
        k_a, (B, params.num_limbs, params.m), 0, min(params.moduli),
        dtype=jnp.int32,
    ).astype(jnp.uint32)
    b0 = jax.random.randint(
        k_b, (B, params.num_limbs, params.m), 0, min(params.moduli),
        dtype=jnp.int32,
    ).astype(jnp.uint32)

    # single-device reference: the jnp external step, n_steps times
    ra, rb = a0, b0
    for k in range(n_steps):
        ra, rb = bs._external_step(
            params, ctx, ra, rb, bkey_hat[k], bkey_shoup[k], ua[:, k],
            None, k,
        )

    mesh = mesh_mod.make_mesh(dp=1, tp=8)
    rplan = rd.build_rotation_plan(params.moduli, 64, 128)
    hat_d, shoup_d = rd.bkey_to_dist(ctx, rplan, bkey_hat)
    ga, gb = rd.blind_rotate_dist(
        params, ctx, rplan, mesh, jnp.asarray(hat_d), jnp.asarray(shoup_d),
        ua, a0, b0,
    )
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(gb))


def test_scheme2_add_with_carry_dist():
    """Production wiring: the scheme-2 functional bootstrap through the
    tp-sharded rotation (the k >= 3 giant-key path), bit-identical to the
    single-device jnp bootstrap and correct under decryption."""
    from sgfhe_tpu.models import bootstrap2 as bs2
    from sgfhe_tpu.models import scheme2 as s2
    from sgfhe_tpu.models.scheme1 import LWE
    from sgfhe_tpu.parallel import rotate_dist as rd2

    params = s2.Params.create(1, n=64)
    ctx = s2.make_context(params)
    sk = s2.PrivateKey.create(params, jax.random.key(1))
    bkey = s2.BootstrapKey.create(ctx, sk, jax.random.key(2))

    B = 8
    rng = np.random.default_rng(4)
    x = rng.integers(0, 2, size=params.n, dtype=np.int64)
    y = rng.integers(0, 2, size=params.n, dtype=np.int64)
    ax, bx = s2.encrypt(sk, jax.random.key(6), jnp.asarray(x))
    ay, by = s2.encrypt(sk, jax.random.key(7), jnp.asarray(y))
    lx = bs2.split_ciphertext(params, ax, bx)
    ly = bs2.split_ciphertext(params, ay, by)
    lwe1 = LWE(lx.a[:B], lx.b[:B])
    lwe2 = LWE(ly.a[:B], ly.b[:B])

    # single-device reference
    d_ref, c_ref = bs2.add_with_carry(params, ctx, bkey, lwe1, lwe2)

    mesh = mesh_mod.make_mesh(dp=1, tp=8)
    rplan = rd2.build_rotation_plan(params.moduli, 16, 32)
    hat_d, shoup_d = rd2.bkey_to_dist(ctx, rplan, bkey.hat)
    d_got, c_got = rd2.add_with_carry_dist(
        params, ctx, rplan, mesh, jnp.asarray(hat_d), jnp.asarray(shoup_d),
        lwe1, lwe2,
    )
    np.testing.assert_array_equal(np.asarray(d_ref.a), np.asarray(d_got.a))
    np.testing.assert_array_equal(np.asarray(d_ref.b), np.asarray(d_got.b))
    np.testing.assert_array_equal(np.asarray(c_ref.a), np.asarray(c_got.a))
    np.testing.assert_array_equal(np.asarray(c_ref.b), np.asarray(c_got.b))

    # and the decrypted truth
    dd = np.asarray(bs2.decrypt_lwe(sk, d_got))
    cc = np.asarray(bs2.decrypt_lwe(sk, c_got))
    s = x[:B] + y[:B]
    np.testing.assert_array_equal(dd, s % 2)
    np.testing.assert_array_equal(cc, s // 2)


def test_scheme1_bootstrap_batch_tp():
    """The scheme-1 twin of the scheme-2 dist test (round-4 VERDICT item 3):
    FULL gate bootstrap with a real key through the tp-sharded rotation —
    bootstrap_batch_tp must be bit-identical to the single-device
    bootstrap_batch, decrypt to correct AND/OR/XOR truth tables, and
    bootstrap_internal_dist must work in randomized mode too (the round-4
    advisor-high NameError fix)."""
    params = F.Params.create(64)
    ctx = F.make_context(params)
    key = jax.random.key(61)
    k_sk, k_bk, k_m, k_e = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)
    msg = np.asarray(jax.random.bernoulli(k_m, 0.5, (params.n,)))
    ct = F.encrypt(sk, k_e, jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    B = 8
    lwe1 = F.LWE(bits.lwe.a[0 : 2 * B : 2], bits.lwe.b[0 : 2 * B : 2])
    lwe2 = F.LWE(bits.lwe.a[1 : 2 * B : 2], bits.lwe.b[1 : 2 * B : 2])

    ref = F.bootstrap_batch(params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2)

    mesh = mesh_mod.make_mesh(dp=1, tp=8)
    rplan = rd.build_rotation_plan(params.moduli, 16, 32)
    hat_d, shoup_d = rd.bkey_to_dist(ctx, rplan, bkey.hat)
    got = rd.bootstrap_batch_tp(
        params, ctx, rplan, mesh, jnp.asarray(hat_d), jnp.asarray(shoup_d),
        lwe1, lwe2,
    )
    y1, y2 = msg[0 : 2 * B : 2], msg[1 : 2 * B : 2]
    expect = [y1 & y2, y1 | y2, y1 ^ y2]
    for (r, g, e) in zip(ref, got, expect):
        np.testing.assert_array_equal(np.asarray(r.a), np.asarray(g.a))
        np.testing.assert_array_equal(np.asarray(r.b), np.asarray(g.b))
        dec = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(g)))
        np.testing.assert_array_equal(dec, e)

    # randomized mode: bootstrap_internal_dist (the internal entry takes the
    # key as-is, so it must match bootstrap_internal bit-for-bit)
    fk = jax.random.key(67)
    trip_ref = bs.bootstrap_internal(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1.a, lwe1.b, lwe2.a, lwe2.b,
        fk, fused=("none", False),
    )
    trip_got = rd.bootstrap_internal_dist(
        params, ctx, rplan, mesh, jnp.asarray(hat_d), jnp.asarray(shoup_d),
        lwe1.a, lwe1.b, lwe2.a, lwe2.b, flat_key=fk,
    )
    for (ra, rb), (ga, gb) in zip(trip_ref, trip_got):
        np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))
        np.testing.assert_array_equal(np.asarray(rb), np.asarray(gb))


def test_add_with_carry_dist_pruned():
    """Digit pruning through the tp-sharded rotation with a PRE-SLICED key
    (bkey_to_dist(prune=1) converts only the kept rows, halving per-chip
    share at l=2): must match the single-device pruned bootstrap bit-for-bit
    and decrypt correctly."""
    from sgfhe_tpu.models import bootstrap2 as bs2
    from sgfhe_tpu.models import scheme2 as s2
    from sgfhe_tpu.models.scheme1 import LWE

    params = s2.Params.create(1, n=64)
    ctx = s2.make_context(params)
    sk = s2.PrivateKey.create(params, jax.random.key(41))
    bkey = s2.BootstrapKey.create(ctx, sk, jax.random.key(42))
    B = 8
    rng = np.random.default_rng(44)
    x = rng.integers(0, 2, size=params.n, dtype=np.int64)
    y = rng.integers(0, 2, size=params.n, dtype=np.int64)
    ax, bx = s2.encrypt(sk, jax.random.key(46), jnp.asarray(x))
    ay, by = s2.encrypt(sk, jax.random.key(47), jnp.asarray(y))
    lx = bs2.split_ciphertext(params, ax, bx)
    ly = bs2.split_ciphertext(params, ay, by)
    lwe1 = LWE(lx.a[:B], lx.b[:B])
    lwe2 = LWE(ly.a[:B], ly.b[:B])

    d_ref, c_ref = bs2.add_with_carry(params, ctx, bkey, lwe1, lwe2, prune=1)

    mesh = mesh_mod.make_mesh(dp=1, tp=8)
    rplan = rd.build_rotation_plan(params.moduli, 16, 32)
    hat_d, shoup_d = rd.bkey_to_dist(ctx, rplan, bkey.hat, prune=1)
    assert hat_d.shape[1] == 2 * (params.num_digits - 1)
    d_got, c_got = rd.add_with_carry_dist(
        params, ctx, rplan, mesh, jnp.asarray(hat_d), jnp.asarray(shoup_d),
        lwe1, lwe2, prune=1,
    )
    np.testing.assert_array_equal(np.asarray(d_ref.a), np.asarray(d_got.a))
    np.testing.assert_array_equal(np.asarray(d_ref.b), np.asarray(d_got.b))
    np.testing.assert_array_equal(np.asarray(c_ref.a), np.asarray(c_got.a))
    np.testing.assert_array_equal(np.asarray(c_ref.b), np.asarray(c_got.b))
    s = x[:B] + y[:B]
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, d_got)), s % 2)
    np.testing.assert_array_equal(np.asarray(bs2.decrypt_lwe(sk, c_got)), s // 2)


def test_blind_rotate_dist_randomized_bit_exact():
    """Randomized flattening in the sharded rotation draws the same global
    Threefry counter stream as the single-device path: bit-equal outputs
    for the same flat_key (m = 8192, truncated 3-step key)."""
    from sgfhe_tpu.ops import rns as rns_mod

    params = F.Params.create(1024)
    ctx = F.make_context(params)
    n_steps, B = 3, 2
    bkey_hat, bkey_shoup = _synthetic_key(
        params, ctx, n_steps, jax.random.key(15)
    )
    k_u, k_a, k_b = jax.random.split(jax.random.key(19), 3)
    ua = jax.random.randint(
        k_u, (B, n_steps), 0, params.r, dtype=jnp.int32
    ).astype(jnp.uint32)
    a0 = jax.random.randint(
        k_a, (B, params.num_limbs, params.m), 0, min(params.moduli),
        dtype=jnp.int32,
    ).astype(jnp.uint32)
    b0 = jax.random.randint(
        k_b, (B, params.num_limbs, params.m), 0, min(params.moduli),
        dtype=jnp.int32,
    ).astype(jnp.uint32)
    fk = jax.random.key(23)

    seed2 = rns_mod.seed_words(fk)
    ra, rb = a0, b0
    for k in range(n_steps):
        ra, rb = bs._external_step(
            params, ctx, ra, rb, bkey_hat[k], bkey_shoup[k], ua[:, k],
            seed2, k,
        )

    mesh = mesh_mod.make_mesh(dp=1, tp=8)
    rplan = rd.build_rotation_plan(params.moduli, 64, 128)
    hat_d, shoup_d = rd.bkey_to_dist(ctx, rplan, bkey_hat)
    ga, gb = rd.blind_rotate_dist(
        params, ctx, rplan, mesh, jnp.asarray(hat_d), jnp.asarray(shoup_d),
        ua, a0, b0, flat_key=fk,
    )
    np.testing.assert_array_equal(np.asarray(ra), np.asarray(ga))
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(gb))
