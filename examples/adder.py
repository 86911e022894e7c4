"""Encrypted ripple-carry adder via the circuit-evaluation layer.

Demonstrates the framework capability ABOVE the reference's single-gate
bootstrap (reference src/fhe.jl:608-621): build a boolean circuit once, then
evaluate it on encrypted inputs with all gate-level parallelism absorbed by
the TPU batch axis. The evaluator shares one bootstrap among AND/OR/XOR of
the same pair and runs B independent additions at once (SIMD over instances).

Usage: python examples/adder.py [nbits=8] [n=64] [instances=4]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu import circuit as C


def main():
    nbits = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    params = F.Params.create(n)
    ctx = F.make_context(params)
    k = jax.random.split(jax.random.key(1234), 3)
    sk = F.PrivateKey.create(params, k[0])
    print(f"building bootstrap key (n={n})...")
    bkey = F.BootstrapKey.create(ctx, sk, k[1])

    circ = C.ripple_adder(nbits)
    num_gates = sum(1 for w in circ._wires if w.op in ("and", "or", "xor"))
    print(
        f"{nbits}-bit adder: {circ.num_bootstraps} bootstraps "
        f"(pair-shared from {num_gates} binary gates), depth {circ.depth}, "
        f"{B} instances in SIMD"
    )

    rng = np.random.default_rng(99)
    pairs = [
        (int(rng.integers(0, 1 << nbits)), int(rng.integers(0, 1 << nbits)))
        for _ in range(B)
    ]
    # encrypt each instance's 2*nbits input bits (one message per instance)
    enc_keys = jax.random.split(k[2], B)
    per_inst = []
    for i, (a, b) in enumerate(pairs):
        msg = np.zeros(params.n, dtype=bool)
        for j in range(nbits):
            msg[j] = (a >> j) & 1
            msg[nbits + j] = (b >> j) & 1
        per_inst.append(
            F.split_ciphertext(F.encrypt(sk, enc_keys[i], jnp.asarray(msg))).lwe
        )
    inputs = [
        F.EncryptedBit(
            F.LWE(
                jnp.stack([per_inst[i].a[j] for i in range(B)]),
                jnp.stack([per_inst[i].b[j] for i in range(B)]),
            )
        )
        for j in range(2 * nbits)
    ]

    t0 = time.perf_counter()
    outs = C.evaluate(circ, params, ctx, bkey, inputs)
    jax.block_until_ready(outs[-1].lwe.a)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    outs = C.evaluate(circ, params, ctx, bkey, inputs)
    jax.block_until_ready(outs[-1].lwe.a)
    t_steady = time.perf_counter() - t0

    dec = [np.asarray(F.decrypt_bit(sk, o)).astype(int) for o in outs]
    ok = True
    for i, (a, b) in enumerate(pairs):
        total = sum(dec[j][i] << j for j in range(nbits + 1))
        status = "ok" if total == a + b else "WRONG"
        ok &= total == a + b
        print(f"  {a} + {b} = {total}  [{status}]")
    print(
        f"evaluate: {t_first:.2f}s first (compile), {t_steady:.2f}s steady "
        f"({circ.num_bootstraps * B / t_steady:.1f} bootstraps/s incl. "
        f"scheduling overhead)"
    )
    if not ok:
        raise SystemExit("FAIL: adder mismatch")
    print("PASS")


if __name__ == "__main__":
    main()
