"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: bootstrapped gates/sec/chip at Params(64) (BASELINE.md north-star
target: >= 10^4; `vs_baseline` is measured/10^4). One bootstrap pass yields
AND+OR+XOR of a pair, counted as one gate op (the reference's convention:
one `bootstrap` call = one timed unit, test/performance.test.jl:114-139).

Also reports NTT transforms/sec at n=512/1024 lengths as secondary metrics on
stderr (BASELINE.md row 2).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def bench_gates(batch=4096, n=64, iters=5):
    import sgfhe_tpu as F

    params = F.Params.create(n)
    ctx = F.make_context(params)
    key = jax.random.key(0)
    k_sk, k_bk, k_a, k_b = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)

    # random valid LWEs (uniform mod r — timing is data-independent)
    a1 = jax.random.randint(k_a, (batch, n), 0, params.r, dtype=jnp.int32).astype(jnp.uint32)
    a2 = jax.random.randint(k_b, (batch, n), 0, params.r, dtype=jnp.int32).astype(jnp.uint32)
    b1 = a1[:, 0]
    b2 = a2[:, 0]
    lwe1 = F.LWE(a1, b1)
    lwe2 = F.LWE(a2, b2)

    # warmup/compile
    out = F.bootstrap_batch(params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2)
    jax.block_until_ready(out[0].a)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = F.bootstrap_batch(params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2)
    jax.block_until_ready(out[0].a)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt, dt


def bench_ntt(n_poly, batch=4096, iters=10):
    from sgfhe_tpu.ops import ntt as ntt_mod
    from sgfhe_tpu.utils import primes as pr

    q = pr.find_modulus(2 * n_poly, 1 << 25)
    plan = ntt_mod.build_plan((q,), n_poly)
    x = jax.random.randint(
        jax.random.key(1), (batch, 1, n_poly), 0, q, dtype=jnp.int32
    ).astype(jnp.uint32)
    f = jax.jit(lambda v: ntt_mod.ntt_fwd(plan, v))
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        y = f(x)
    jax.block_until_ready(y)
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    gates_per_sec, dt = bench_gates(batch=batch)
    if os.environ.get("SGFHE_BENCH_512"):
        gps512, dt512 = bench_gates(batch=64, n=512, iters=3)
        print(
            f"bootstrap n=512: 64 gates in {dt512*1000:.1f} ms -> "
            f"{gps512:.1f} gates/s",
            file=sys.stderr,
        )
    print(
        f"bootstrap: {batch} gates in {dt*1000:.1f} ms -> {gates_per_sec:.1f} gates/s",
        file=sys.stderr,
    )
    for npoly in (512, 1024):
        try:
            tps = bench_ntt(npoly)
            print(f"ntt n={npoly}: {tps:.0f} transforms/s", file=sys.stderr)
        except Exception as e:  # secondary metric; never break the headline
            print(f"ntt n={npoly} failed: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "bootstrap_gates_per_sec_chip",
                "value": round(gates_per_sec, 1),
                "unit": "gates/s",
                "vs_baseline": round(gates_per_sec / 1e4, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
