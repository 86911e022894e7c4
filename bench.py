"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: bootstrapped gates/sec/chip at Params(64), EXACT deterministic mode
(bit-exact vs SGFHE.jl semantics; BASELINE.md north-star target >= 10^4;
`vs_baseline` is measured/10^4). One bootstrap pass yields AND+OR+XOR of a
pair, counted as one gate op (the reference's convention: one `bootstrap`
call = one timed unit, test/performance.test.jl:114-139).

The bench DECRYPTS its outputs and asserts the gate truth tables on the
attached device — a miscompiled kernel fails the run loudly instead of
publishing a fast-but-wrong number. The JSON line also carries a
`secondary` dict (Params(512)/Params(1024) rates, randomized-mode rates,
approximate-gadget `prune` rates, NTT transforms/s, pack_encrypted_bits)
and a `regression` report against the previous round's BENCH_r*.json
(>3% drop on any shared metric is flagged loudly; >10% on the headline
fails the run).

Env: SGFHE_BENCH_SKIP_512=1 / SGFHE_BENCH_SKIP_1024=1 / SGFHE_BENCH_SKIP_PACK=1
skip the slow columns (each adds minutes of setup on a cold cache);
SGFHE_BENCH_SKIP_PRUNE=1 skips the approximate-gadget rows; SGFHE_TILE /
SGFHE_FUSED tune the kernel dispatch (ops/fused.py).
"""

import glob
import json
import os
import re
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

# persistent compile cache: the n=512 streamed kernel takes ~2.5 min of
# Mosaic compile cold; cached it is seconds
_here = os.path.dirname(os.path.abspath(__file__))
_cache = os.path.join(_here, ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

SECONDARY = {}


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


def _check(F, sk, out, expected, what):
    for name, lwe, e in zip(["AND", "OR", "XOR"], out, expected):
        got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(lwe)))
        if not (got == e).all():
            print(
                f"FATAL: {what} {name} wrong for "
                f"{int((got != e).sum())}/{len(e)} gates",
                file=sys.stderr,
            )
            raise SystemExit(1)


def bench_gates(n=64, batch=4096, iters=5, prunes=(1, 2)):
    """Times the exact mode (headline), randomized mode, and the
    approximate-gadget pruned modes; every variant is decrypt-verified.
    Returns the EXACT-mode gates/s; all rates land in SECONDARY."""
    import sgfhe_tpu as F

    params, ctx, sk, bkey, msg, bits = setup(n)
    idx1 = np.arange(batch) % (params.n - 1)
    idx2 = idx1 + 1
    lwe1 = F.LWE(bits.lwe.a[idx1], bits.lwe.b[idx1])
    lwe2 = F.LWE(bits.lwe.a[idx2], bits.lwe.b[idx2])
    m1, m2 = msg[idx1], msg[idx2]
    expected = [m1 & m2, m1 | m2, m1 ^ m2]

    def run(prune=0, fk=None):
        return F.bootstrap_batch(
            params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2, fk,
            fk is not None, None, prune,
        )

    def timed(tag, reps, prune=0, fk=None):
        out = run(prune, fk)  # warm + correctness gate
        jax.block_until_ready(out[0].a)
        _check(F, sk, out, expected, f"n={n} {tag}")
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(prune, fk)
        jax.block_until_ready(out[0].a)
        dt = (time.perf_counter() - t0) / reps
        rate = batch / dt
        print(
            f"bootstrap n={n} {tag}: {batch} gates in {dt*1000:.1f} ms -> "
            f"{rate:.1f} gates/s (truth tables verified)",
            file=sys.stderr,
        )
        return rate, dt

    rate, dt = timed("exact", iters)
    SECONDARY[f"gates_n{n}"] = round(rate, 1)

    fk = jax.random.key(17)
    rate_r, _ = timed("randomized", max(1, iters // 2), fk=fk)
    SECONDARY[f"gates_n{n}_randomized"] = round(rate_r, 1)

    if not os.environ.get("SGFHE_BENCH_SKIP_PRUNE"):
        for prune in prunes:
            if prune >= params.num_digits:
                continue
            try:
                rate_p, _ = timed(f"prune={prune}", iters, prune=prune)
                SECONDARY[f"gates_n{n}_prune{prune}"] = round(rate_p, 1)
            except SystemExit:
                raise
            except Exception as e:
                print(f"n={n} prune={prune} failed: {e}", file=sys.stderr)
    return rate, dt, params


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


def bench_pack(params, ctx, sk, bkey, msg, bits, iters=3):
    import sgfhe_tpu as F

    ct = F.pack_encrypted_bits(params, ctx, bkey, bits)
    jax.block_until_ready(ct.rlwe.a)
    dec = np.asarray(F.decrypt(sk, ct))
    if not (dec == msg).all():
        print("FATAL: pack decrypt mismatch", file=sys.stderr)
        raise SystemExit(1)
    t0 = time.perf_counter()
    for _ in range(iters):
        ct = F.pack_encrypted_bits(params, ctx, bkey, bits)
    jax.block_until_ready(ct.rlwe.a)
    return (time.perf_counter() - t0) / iters


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


def load_previous_record():
    """The newest BENCH_r*.json next to this file (the driver's record of
    the previous round) — the self-comparison baseline (round-4 VERDICT:
    nothing caught headline drift before)."""
    best, best_n = None, -1
    for path in glob.glob(os.path.join(_here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
        except Exception:
            continue
        if int(m.group(1)) > best_n:
            best, best_n = rec, int(m.group(1))
    return best, best_n


def regression_report(headline):
    prev, prev_round = load_previous_record()
    if not prev:
        return {"previous_round": None}
    report = {"previous_round": prev_round, "flags": []}
    checks = {"bootstrap_gates_per_sec_chip": (headline, prev.get("value"))}
    prev_sec = prev.get("secondary") or {}
    for k, v in SECONDARY.items():
        if k in prev_sec:
            checks[k] = (v, prev_sec[k])
    for name, (now, old) in checks.items():
        if not (isinstance(old, (int, float)) and old > 0):
            continue
        change = (now - old) / old
        report[name] = {"now": now, "prev": old, "change_pct": round(100 * change, 2)}
        if change < -0.03:
            flag = f"REGRESSION {name}: {now} vs {old} ({100*change:+.1f}%)"
            report["flags"].append(flag)
            print(flag, file=sys.stderr)
    head = checks["bootstrap_gates_per_sec_chip"]
    if head[1] and (head[0] - head[1]) / head[1] < -0.10:
        print(
            f"FATAL: headline dropped >10% vs round {prev_round} "
            f"({head[0]} vs {head[1]})",
            file=sys.stderr,
        )
        raise SystemExit(1)
    return report


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    gates_per_sec, dt, params64 = bench_gates(n=64, batch=batch)
    report_roofline(params64, gates_per_sec)
    if not os.environ.get("SGFHE_BENCH_SKIP_512"):
        try:
            params512, ctx512, sk512, bkey512, msg512, bits512 = setup(512)
            # reuse the built key for gates AND pack
            import sgfhe_tpu as F

            idx1 = np.arange(64) % (params512.n - 1)
            idx2 = idx1 + 1
            l1 = F.LWE(bits512.lwe.a[idx1], bits512.lwe.b[idx1])
            l2 = F.LWE(bits512.lwe.a[idx2], bits512.lwe.b[idx2])
            m1, m2 = msg512[idx1], msg512[idx2]
            exp = [m1 & m2, m1 | m2, m1 ^ m2]

            def run512(prune=0, fk=None):
                return F.bootstrap_batch(
                    params512, ctx512, bkey512.hat, bkey512.hat_shoup, l1, l2,
                    fk, fk is not None, None, prune,
                )

            def timed512(tag, reps, prune=0, fk=None):
                out = run512(prune, fk)
                jax.block_until_ready(out[0].a)
                _check(F, sk512, out, exp, f"n=512 {tag}")
                t0 = time.perf_counter()
                for _ in range(reps):
                    out = run512(prune, fk)
                jax.block_until_ready(out[0].a)
                rate = 64 * reps / (time.perf_counter() - t0)
                print(
                    f"bootstrap n=512 {tag}: {rate:.1f} gates/s "
                    f"(truth tables verified)",
                    file=sys.stderr,
                )
                return rate

            SECONDARY["gates_n512"] = round(timed512("exact", 3), 1)
            SECONDARY["gates_n512_randomized"] = round(
                timed512("randomized", 2, fk=jax.random.key(17)), 1
            )
            if not os.environ.get("SGFHE_BENCH_SKIP_PRUNE"):
                for prune in (1, 2):
                    try:
                        SECONDARY[f"gates_n512_prune{prune}"] = round(
                            timed512(f"prune={prune}", 3, prune=prune), 1
                        )
                    except SystemExit:
                        raise
                    except Exception as e:
                        print(f"n=512 prune={prune} failed: {e}", file=sys.stderr)
            report_roofline(params512, SECONDARY["gates_n512"])
            if not os.environ.get("SGFHE_BENCH_SKIP_PACK"):
                try:
                    dt_pack = bench_pack(
                        params512, ctx512, sk512, bkey512, msg512, bits512
                    )
                    SECONDARY["pack_n512_seconds"] = round(dt_pack, 3)
                    print(
                        f"pack_encrypted_bits n=512: {dt_pack:.2f} s "
                        f"(decrypt verified)",
                        file=sys.stderr,
                    )
                except SystemExit:
                    raise
                except Exception as e:
                    print(f"pack bench failed: {e}", file=sys.stderr)
        except SystemExit:
            raise
        except Exception as e:
            print(f"n=512 bench failed: {e}", file=sys.stderr)
    if not os.environ.get("SGFHE_BENCH_SKIP_1024"):
        # the reference's perf tier runs Params(1024)
        # (test/performance.test.jl:54-78); L = 3 limbs exercises the lazy-
        # reduction reset schedule on real hardware
        try:
            gps1k, dt1k, params1k = bench_gates(
                n=1024, batch=16, iters=2, prunes=(2,)
            )
            report_roofline(params1k, gps1k)
        except SystemExit:
            raise
        except Exception as e:
            print(f"n=1024 bench failed: {e}", file=sys.stderr)
    if not os.environ.get("SGFHE_BENCH_SKIP_S2"):
        # scheme-2 k=1 functional bootstrap (paper n=1024): adds + muls per
        # second in the machine-readable record (round-4 VERDICT item 4)
        try:
            import sgfhe_tpu as F
            from sgfhe_tpu.models import bootstrap2 as bs2
            from sgfhe_tpu.models import scheme2 as s2

            p2 = s2.Params.create(1)
            ctx2 = s2.make_context(p2)
            sk2 = s2.PrivateKey.create(p2, jax.random.key(21))
            bkey2 = s2.BootstrapKey.create(ctx2, sk2, jax.random.key(22))
            rng = np.random.default_rng(23)
            x2 = rng.integers(0, 2, p2.n)
            y2 = rng.integers(0, 2, p2.n)
            a2_, b2_ = s2.encrypt(sk2, jax.random.key(24), jnp.asarray(x2))
            a3_, b3_ = s2.encrypt(sk2, jax.random.key(25), jnp.asarray(y2))
            lx = bs2.split_ciphertext(p2, a2_, b2_)
            ly = bs2.split_ciphertext(p2, a3_, b3_)
            sb = 64
            lx = F.LWE(lx.a[:sb], lx.b[:sb])
            ly = F.LWE(ly.a[:sb], ly.b[:sb])
            z2 = x2[:sb] + y2[:sb]

            def s2_add(prune=0):
                d, c = bs2.add_with_carry(p2, ctx2, bkey2, lx, ly, prune=prune)
                jax.block_until_ready(d.a)
                if not (
                    (np.asarray(bs2.decrypt_lwe(sk2, d)) == z2 % 2).all()
                    and (np.asarray(bs2.decrypt_lwe(sk2, c)) == z2 // 2).all()
                ):
                    print("FATAL: scheme2 k=1 add wrong", file=sys.stderr)
                    raise SystemExit(1)

            for prune, name in ((0, "s2_k1_adds"), (1, "s2_k1_adds_prune1")):
                s2_add(prune)
                t0 = time.perf_counter()
                for _ in range(3):
                    d, c = bs2.add_with_carry(
                        p2, ctx2, bkey2, lx, ly, prune=prune
                    )
                jax.block_until_ready(d.a)
                rate = 3 * sb / (time.perf_counter() - t0)
                SECONDARY[name] = round(rate, 1)
                print(f"scheme2 k=1 adds/s (prune={prune}): {rate:.1f} "
                      f"(verified)", file=sys.stderr)
            lo, hi = bs2.mul(p2, ctx2, bkey2, lx, ly)
            jax.block_until_ready(lo.a)
            prod = x2[:sb] * y2[:sb]
            if not (
                (np.asarray(bs2.decrypt_lwe(sk2, lo)) == prod % 2).all()
                and (np.asarray(bs2.decrypt_lwe(sk2, hi)) == prod // 2).all()
            ):
                print("FATAL: scheme2 k=1 mul wrong", file=sys.stderr)
                raise SystemExit(1)
            t0 = time.perf_counter()
            for _ in range(2):
                lo, hi = bs2.mul(p2, ctx2, bkey2, lx, ly)
            jax.block_until_ready(lo.a)
            rate = 2 * sb / (time.perf_counter() - t0)
            SECONDARY["s2_k1_muls"] = round(rate, 1)
            print(f"scheme2 k=1 muls/s: {rate:.1f} (verified)", file=sys.stderr)
        except SystemExit:
            raise
        except Exception as e:
            print(f"scheme2 bench failed: {e}", file=sys.stderr)
    for npoly in (512, 1024):
        try:
            tps = bench_ntt(npoly)
            SECONDARY[f"ntt_n{npoly}_transforms_per_sec"] = round(tps)
            print(f"ntt n={npoly}: {tps:.0f} transforms/s", file=sys.stderr)
        except Exception as e:
            print(f"ntt n={npoly} failed: {e}", file=sys.stderr)
    regression = regression_report(round(gates_per_sec, 1))
    print(
        json.dumps(
            {
                "metric": "bootstrap_gates_per_sec_chip",
                "value": round(gates_per_sec, 1),
                "unit": "gates/s",
                "vs_baseline": round(gates_per_sec / 1e4, 4),
                "secondary": SECONDARY,
                "regression": regression,
            }
        )
    )


if __name__ == "__main__":
    main()
