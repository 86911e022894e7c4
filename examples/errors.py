"""Empirical noise measurement (reference examples/errors.jl): measures the
LWE error distribution after encryption, splitting, bootstrapping and packing
against the paper's bounds (eprint 2018/637)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.debug.noise import lwe_error, noise_budget_report, rlwe_error


def main(n=64, trials=4):
    params = F.Params.create(n)
    ctx = F.make_context(params)
    key = jax.random.key(0)
    k_sk, k_bk = jax.random.split(key)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)

    print(f"n={n}: r={params.r}, Dr={params.Dr}, paper bound Dr/4={params.Dr//4}")
    enc_errs, boot_errs, pack_errs = [], [], []
    for t in range(trials):
        kt = jax.random.fold_in(key, t + 1)
        k_msg, k_enc, _ = jax.random.split(kt, 3)
        msg = np.asarray(jax.random.bernoulli(k_msg, 0.5, (params.n,)))
        ct = F.encrypt(sk, k_enc, jnp.asarray(msg))
        enc_errs.append(np.abs(rlwe_error(sk, ct, msg)).max())

        bits = F.split_ciphertext(ct)
        lwe1 = F.LWE(bits.lwe.a[0::2], bits.lwe.b[0::2])
        lwe2 = F.LWE(bits.lwe.a[1::2], bits.lwe.b[1::2])
        and_l, or_l, xor_l = F.bootstrap_batch(
            params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2
        )
        y1, y2 = msg[0::2], msg[1::2]
        boot_errs.append(
            np.abs(lwe_error(sk, F.EncryptedBit(and_l), y1 & y2)).max()
        )

        packed = F.pack_encrypted_bits(params, ctx, bkey, bits)
        pack_errs.append(np.abs(rlwe_error(sk, packed, msg)).max())

    print(f"encrypt max|err|:   {max(enc_errs)}  (budget Dr/2 = {params.Dr//2})")
    print(f"bootstrap max|err|: {max(boot_errs)}")
    print(f"pack max|err|:      {max(pack_errs)}")
    rep = noise_budget_report(sk, F.EncryptedBit(and_l), y1 & y2)
    print("bootstrap noise report:", rep)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    main(n)
