"""Conformance of the jitted TPU kernels against the exact big-int golden
model (sgfhe_tpu/refimpl/golden.py): the full blind rotation AND the final
mod-r LWEs are compared bit-for-bit (the Q->r rescale is exact,
rns.rescale_exact).

This is the strongest scheme-level check: the two implementations share only
`Params` — different polynomial multiplication (NTT+Shoup vs split matmul),
different flatten (RNS mixed-radix chain vs positional big-int divmod),
different rescale (estimate+multi-limb-correction vs big-int rounding).
"""

import numpy as np
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.models import bootstrap as bs
from sgfhe_tpu.ops import ntt as ntt_mod
from sgfhe_tpu.refimpl.golden import GoldenScheme


def test_bootstrap_matches_golden():
    params = F.Params.create(64)
    ctx = F.make_context(params)
    key = jax.random.key(2024)
    k_sk, k_bk, k_msg, k_enc = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)

    msg = np.asarray(jax.random.bernoulli(k_msg, 0.5, (params.n,)))
    ct = F.encrypt(sk, k_enc, jnp.asarray(msg))
    bits = F.split_ciphertext(ct)

    # one gate: bits 0 and 1
    a1 = np.asarray(bits.lwe.a[:1])
    b1 = np.asarray(bits.lwe.b[:1])
    a2 = np.asarray(bits.lwe.a[1:2])
    b2 = np.asarray(bits.lwe.b[1:2])

    # device blind rotation (Q domain)
    dev = bs.bootstrap_internal(
        params, ctx, bkey.hat, bkey.hat_shoup,
        jnp.asarray(a1), jnp.asarray(b1), jnp.asarray(a2), jnp.asarray(b2),
        None,
    )

    # golden blind rotation on the SAME bootstrap key (recover coefficient
    # domain from the NTT-domain key)
    g = GoldenScheme(params)
    c_coeff = np.asarray(ntt_mod.ntt_inv(ctx.plan_Q, bkey.hat)).astype(np.uint64)
    gold = g.bootstrap_internal(c_coeff, a1[0], b1[0], a2[0], b2[0])

    for gi, (name, di) in enumerate(
        zip(["and", "or", "xor"], dev)
    ):
        da, db = di
        # device residues -> ints
        da_int = g.from_rns(np.asarray(da)[0].astype(np.uint64))  # n values
        db_int = g.from_rns(np.asarray(db)[0].astype(np.uint64).reshape(-1, 1))[0]
        ga, gb = gold[gi]
        assert da_int == [int(v) for v in ga], f"{name}: a mismatch"
        assert int(db_int) == int(gb), f"{name}: b mismatch"

    # reduced mod-r LWEs match the exact golden rescale bit-for-bit
    for gi, di in enumerate(dev):
        lwe_dev = bs._reduce_lwe(params, ctx, di)
        ga, gb = g.reduce_lwe_to_r(gold[gi])
        dev_a = np.asarray(lwe_dev.a)[0].astype(np.int64)
        np.testing.assert_array_equal(dev_a, np.array(ga))
        assert int(np.asarray(lwe_dev.b)[0]) == int(gb)

    # decrypted gate outputs match plaintext logic through the golden decrypt
    s_bits = np.asarray(sk.key)
    y1, y2 = bool(msg[0]), bool(msg[1])
    expected = [y1 and y2, y1 or y2, y1 ^ y2]
    for gi, di in enumerate(dev):
        ga, gb = g.reduce_lwe_to_r(gold[gi])
        assert g.decrypt_lwe(s_bits, ga, gb) == int(expected[gi])
