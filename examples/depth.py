"""Bootstrap depth soak (reference examples/depth.jl:63-78): chain gate
generations — the outputs of generation g feed generation g+1 — asserting
correctness at every step. The de-facto noise-budget regression test: any
systematic noise growth would flip a bit within a few generations.

Usage: python examples/depth.py [generations=100] [n=64]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.debug.noise import lwe_error


def main(generations=100, n=64, prune=0):
    params = F.Params.create(n)
    ctx = F.make_context(params)
    key = jax.random.key(0)
    k_sk, k_bk, k_msg, k_enc = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)

    msg = np.asarray(jax.random.bernoulli(k_msg, 0.5, (params.n,)))
    ct = F.encrypt(sk, k_enc, jnp.asarray(msg))
    bits = F.split_ciphertext(ct)

    # pair up: gates on halves; each generation feeds (AND, OR) outputs back
    half = params.n // 2
    cur1 = F.LWE(bits.lwe.a[:half], bits.lwe.b[:half])
    cur2 = F.LWE(bits.lwe.a[half:], bits.lwe.b[half:])
    y1 = msg[:half].astype(bool)
    y2 = msg[half:].astype(bool)

    t0 = time.time()
    max_err = 0
    for g in range(generations):
        and_l, or_l, xor_l = F.bootstrap_batch(
            params, ctx, bkey.hat, bkey.hat_shoup, cur1, cur2, prune=prune
        )
        e_and = y1 & y2
        e_or = y1 | y2
        e_xor = y1 ^ y2
        got_and = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(and_l)))
        got_or = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(or_l)))
        got_xor = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(xor_l)))
        assert (got_and == e_and).all(), f"AND wrong at generation {g}"
        assert (got_or == e_or).all(), f"OR wrong at generation {g}"
        assert (got_xor == e_xor).all(), f"XOR wrong at generation {g}"
        err = int(
            np.abs(lwe_error(sk, F.EncryptedBit(and_l), e_and)).max()
        )
        max_err = max(max_err, err)
        # feed forward: AND and XOR become the next generation's inputs
        cur1, cur2 = and_l, xor_l
        y1, y2 = e_and, e_xor
        if (g + 1) % 10 == 0:
            print(
                f"generation {g+1}/{generations} ok "
                f"(max |err| so far {max_err}, boundary {params.Dr//2})",
                flush=True,
            )
    dt = time.time() - t0
    print(
        f"PASS: {generations} chained generations x {half} gates in {dt:.1f}s; "
        f"max |noise| {max_err} vs paper bound {params.Dr//4} "
        f"and decision boundary {params.Dr//2}"
    )


if __name__ == "__main__":
    gens = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    prune = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    main(gens, n, prune)
