"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: bootstrapped gates/sec/chip at Params(64) (BASELINE.md north-star
target: >= 10^4; `vs_baseline` is measured/10^4). One bootstrap pass yields
AND+OR+XOR of a pair, counted as one gate op (the reference's convention:
one `bootstrap` call = one timed unit, test/performance.test.jl:114-139).

The bench DECRYPTS its outputs and asserts the gate truth tables on the
attached device — a miscompiled kernel fails the run loudly instead of
publishing a fast-but-wrong number. Secondary metrics on stderr: Params(512)
gates/s, NTT transforms/s at n=512/1024, and VPU-roofline utilization
(measured Shoup-mul ceiling vs the kernel's analytic op count).

Env: SGFHE_BENCH_SKIP_512=1 / SGFHE_BENCH_SKIP_1024=1 skip the Params(512) /
Params(1024) columns (each adds minutes of setup on a cold cache);
SGFHE_TILE / SGFHE_FUSED tune the kernel dispatch (ops/fused.py).
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache: the n=512 streamed kernel takes ~2.5 min of
# Mosaic compile cold; cached it is seconds
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


def setup(n):
    import sgfhe_tpu as F

    params = F.Params.create(n)
    ctx = F.make_context(params)
    key = jax.random.key(0)
    k_sk, k_bk, k_msg, k_enc = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)
    msg = jax.random.bernoulli(k_msg, 0.5, (params.n,))
    ct = F.encrypt(sk, k_enc, msg)
    bits = F.split_ciphertext(ct)
    return params, ctx, sk, bkey, np.asarray(msg), bits


def bench_gates(n=64, batch=4096, iters=5):
    """Returns (gates_per_sec, seconds_per_batch); asserts correctness."""
    import sgfhe_tpu as F

    params, ctx, sk, bkey, msg, bits = setup(n)
    idx1 = np.arange(batch) % (params.n - 1)
    idx2 = idx1 + 1
    lwe1 = F.LWE(bits.lwe.a[idx1], bits.lwe.b[idx1])
    lwe2 = F.LWE(bits.lwe.a[idx2], bits.lwe.b[idx2])

    out = F.bootstrap_batch(params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2)
    jax.block_until_ready(out[0].a)

    # correctness gate: decrypt on-device, compare against plaintext logic
    m1, m2 = msg[idx1], msg[idx2]
    expected = [m1 & m2, m1 | m2, m1 ^ m2]
    for name, lwe, e in zip(["AND", "OR", "XOR"], out, expected):
        got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(lwe)))
        if not (got == e).all():
            print(
                f"FATAL: n={n} {name} wrong for "
                f"{int((got != e).sum())}/{batch} gates",
                file=sys.stderr,
            )
            raise SystemExit(1)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = F.bootstrap_batch(
            params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2
        )
    jax.block_until_ready(out[0].a)
    dt = (time.perf_counter() - t0) / iters

    # secondary: randomized-flattening mode (the reference's rng!=nothing
    # security posture), also checked for correctness
    fk = jax.random.key(17)
    out_r = F.bootstrap_batch(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, True
    )
    got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(out_r[0])))
    if not (got == expected[0]).all():
        print(f"FATAL: n={n} randomized AND wrong", file=sys.stderr)
        raise SystemExit(1)
    t0 = time.perf_counter()
    for _ in range(max(1, iters // 2)):
        out_r = F.bootstrap_batch(
            params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk, True
        )
    jax.block_until_ready(out_r[0].a)
    dt_r = (time.perf_counter() - t0) / max(1, iters // 2)
    print(
        f"bootstrap n={n} randomized: {batch/dt_r:.1f} gates/s "
        f"(truth table verified)",
        file=sys.stderr,
    )
    return batch / dt, dt, params


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


def report_roofline(params, gates_per_sec):
    from sgfhe_tpu.utils import profiling

    cost = profiling.op_cost(params)
    try:
        ceiling = profiling.measure_sme_rate()
    except Exception as e:  # secondary metric; never break the headline
        print(f"roofline microbench failed: {e}", file=sys.stderr)
        return
    achieved = gates_per_sec * cost.sme_per_gate
    ratio = achieved / ceiling
    # the microbench is an ILP-16 dependent-chain rate — a LOWER bound on
    # the true VPU throughput (CSE across the kernel's shared operands makes
    # its effective per-multiply cost smaller), so ratio > 1 means the
    # kernel is at/over the practically measurable uint32-multiply rate:
    # further speedups must come from fewer multiplies, not scheduling.
    print(
        f"roofline n={params.n}: {cost.sme_per_gate/1e6:.1f}M shoup-equiv/"
        f"gate analytic; sustained {achieved/1e9:.1f}G shoup-equiv/s = "
        f"{ratio:.2f}x the measured chain-microbench rate "
        f"({ceiling/1e9:.1f}G/s, itself a lower bound on the VPU ceiling)",
        file=sys.stderr,
    )


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    gates_per_sec, dt, params64 = bench_gates(n=64, batch=batch)
    print(
        f"bootstrap n=64: {batch} gates in {dt*1000:.1f} ms -> "
        f"{gates_per_sec:.1f} gates/s (truth tables verified)",
        file=sys.stderr,
    )
    report_roofline(params64, gates_per_sec)
    if not os.environ.get("SGFHE_BENCH_SKIP_512"):
        try:
            gps512, dt512, params512 = bench_gates(n=512, batch=64, iters=3)
            print(
                f"bootstrap n=512: 64 gates in {dt512*1000:.1f} ms -> "
                f"{gps512:.1f} gates/s (truth tables verified)",
                file=sys.stderr,
            )
            report_roofline(params512, gps512)
        except SystemExit:
            raise
        except Exception as e:
            print(f"n=512 bench failed: {e}", file=sys.stderr)
    if not os.environ.get("SGFHE_BENCH_SKIP_1024"):
        # the reference's perf tier runs Params(1024)
        # (test/performance.test.jl:54-78); L = 3 limbs exercises the lazy-
        # reduction reset schedule on real hardware
        try:
            gps1k, dt1k, params1k = bench_gates(n=1024, batch=16, iters=2)
            print(
                f"bootstrap n=1024: 16 gates in {dt1k*1000:.1f} ms -> "
                f"{gps1k:.1f} gates/s (truth tables verified)",
                file=sys.stderr,
            )
            report_roofline(params1k, gps1k)
        except SystemExit:
            raise
        except Exception as e:
            print(f"n=1024 bench failed: {e}", file=sys.stderr)
    for npoly in (512, 1024):
        try:
            tps = bench_ntt(npoly)
            print(f"ntt n={npoly}: {tps:.0f} transforms/s", file=sys.stderr)
        except Exception as e:
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
