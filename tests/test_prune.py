"""Approximate-gadget digit pruning (round-4 VERDICT item 1): dropping the
`prune` lowest mixed-radix digit rows of the external product
(ops/rns.flatten(prune=...), ops/fused kernels, bootstrap_batch(prune=...)).

Pruned mode is NOT bit-identical to the exact path (by design), but:
 - all three compute paths (jnp, resident kernel, streamed kernel) must
   agree bit-for-bit WITH EACH OTHER at the same prune setting;
 - outputs must decrypt to the correct gate truth tables;
 - measured phase noise must stay far inside the Dr/4 paper bound — the
   analytic bound is models/params.prune_error_bound (docs/theory.md);
 - an unsafe prune setting must be rejected loudly at trace time.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.debug.noise import lwe_error
from sgfhe_tpu.models import bootstrap as bs
from sgfhe_tpu.models.params import prune_error_bound


@pytest.fixture(scope="module")
def setup64():
    params = F.Params.create(64)
    ctx = F.make_context(params)
    key = jax.random.key(101)
    k_sk, k_bk, k_m, k_e = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)
    msg = np.asarray(jax.random.bernoulli(k_m, 0.5, (params.n,)))
    ct = F.encrypt(sk, k_e, jnp.asarray(msg))
    bits = F.split_ciphertext(ct)
    B = 8
    lwe1 = F.LWE(bits.lwe.a[0 : 2 * B : 2], bits.lwe.b[0 : 2 * B : 2])
    lwe2 = F.LWE(bits.lwe.a[1 : 2 * B : 2], bits.lwe.b[1 : 2 * B : 2])
    y1, y2 = msg[0 : 2 * B : 2], msg[1 : 2 * B : 2]
    return params, ctx, sk, bkey, lwe1, lwe2, (y1 & y2, y1 | y2, y1 ^ y2)


@pytest.mark.parametrize("prune", [1, 2])
def test_pruned_paths_agree_and_decrypt(setup64, prune):
    params, ctx, sk, bkey, lwe1, lwe2, expect = setup64
    ref = bs._bootstrap_batch_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, None, False,
        ("none", False), prune,
    )
    # correctness under decryption + noise margin
    for lwe, e in zip(ref, expect):
        got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(lwe)))
        np.testing.assert_array_equal(got, e)
    err = lwe_error(sk, F.EncryptedBit(ref[0]), expect[0])
    assert np.abs(err).max() < params.Dr // 4, (
        f"pruned noise {np.abs(err).max()} vs bound {params.Dr // 4}"
    )
    # analytic pruning term is microscopic at these sizes
    assert prune_error_bound(params, prune) < 0.1

    # kernel paths bit-identical to the pruned jnp path
    for kernel in ("resident", "streamed"):
        got = bs._bootstrap_batch_jit(
            params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, None, False,
            (kernel, True), prune,
        )
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r.a), np.asarray(g.a))
            np.testing.assert_array_equal(np.asarray(r.b), np.asarray(g.b))

    # pruned differs from exact (it IS an approximation)
    exact = bs._bootstrap_batch_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, None, False,
        ("none", False), 0,
    )
    assert not (np.asarray(exact[0].a) == np.asarray(ref[0].a)).all()


def test_pruned_randomized_paths_agree(setup64):
    params, ctx, sk, bkey, lwe1, lwe2, expect = setup64
    prune = 1
    fk = jax.random.key(33)
    ref = bs._bootstrap_batch_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, True,
        ("none", False), prune,
    )
    for lwe, e in zip(ref, expect):
        got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(lwe)))
        np.testing.assert_array_equal(got, e)
    for kernel in ("resident", "streamed"):
        got = bs._bootstrap_batch_jit(
            params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, True,
            (kernel, True), prune,
        )
        for r, g in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(r.a), np.asarray(g.a))
            np.testing.assert_array_equal(np.asarray(r.b), np.asarray(g.b))


def test_public_entry_and_guard(setup64):
    params, ctx, sk, bkey, lwe1, lwe2, expect = setup64
    out = F.bootstrap_batch(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, prune=1
    )
    for lwe, e in zip(out, expect):
        got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(lwe)))
        np.testing.assert_array_equal(got, e)

    # an unsafe prune setting must fail loudly at trace time: tiny synthetic
    # moduli make the pruned weight comparable to Q and the bound blows past
    # Dr/16 (the guard fires before any device work, so no valid NTT tables
    # are needed)
    import dataclasses

    params_bad = dataclasses.replace(params, moduli=(11, 13, 101))
    assert prune_error_bound(params_bad, 2) > params_bad.Dr / 16
    with pytest.raises(AssertionError, match="digit pruning"):
        bs.blind_rotate(
            params_bad, ctx, bkey.hat, bkey.hat_shoup, None, None, None,
            prune=2,
        )
