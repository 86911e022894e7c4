"""Scheme-2 k-bit homomorphic addition on real hardware (eprint 2019/521).

Runs the functional bootstrap at the paper's production size (n = 1024,
k configurable): encrypts two vectors of k-bit digits, computes
digit/carry = add_with_carry(x, y) in batches, decrypts and checks every
result, and reports adds/sec plus the observed phase noise against the
decision boundary Dr/2.

The reference never implements this (src/fhe2.jl:6 "not finished"); this
demonstrates capability beyond the reference on the TPU build.

Usage: python examples/scheme2_add.py [k] [batch] [n] [prune]
(n defaults to the paper's 1024 — pass a smaller power of four for a quick
CPU run, e.g. in CI; prune > 0 enables the approximate-gadget fast mode.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

_cache = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from sgfhe_tpu.models import scheme2 as s2
from sgfhe_tpu.models import bootstrap2 as bs2
from sgfhe_tpu.models.scheme1 import LWE


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n = int(sys.argv[3]) if len(sys.argv) > 3 else None
    prune = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    print(f"device: {jax.devices()[0]}", flush=True)
    t0 = time.time()
    params = s2.Params.create(k, n=n)
    ctx = s2.make_context(params)
    sk = s2.PrivateKey.create(params, jax.random.key(1))
    print(
        f"Params(k={k}): n={params.n} m={params.m} r={params.r} "
        f"L={params.num_limbs} Q~2^{params.Q.bit_length()} "
        f"[{time.time()-t0:.1f}s]",
        flush=True,
    )
    t0 = time.time()
    bkey = s2.BootstrapKey.create(ctx, sk, jax.random.key(2))
    jax.block_until_ready(bkey.hat)
    kb = bkey.hat.size * 8 / 2**20
    print(f"BootstrapKey: {kb:.0f} MiB (hat+shoup) [{time.time()-t0:.1f}s]",
          flush=True)

    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**k, params.n)
    y = rng.integers(0, 2**k, params.n)
    ax, bx = s2.encrypt(sk, jax.random.key(3), jnp.asarray(x))
    ay, by = s2.encrypt(sk, jax.random.key(4), jnp.asarray(y))
    lx = bs2.split_ciphertext(params, ax, bx)
    ly = bs2.split_ciphertext(params, ay, by)
    idx = np.arange(batch) % params.n
    lx = LWE(lx.a[idx], lx.b[idx])
    ly = LWE(ly.a[idx], ly.b[idx])

    t0 = time.time()
    digit, carry = bs2.add_with_carry(params, ctx, bkey, lx, ly, prune=prune)
    jax.block_until_ready(digit.a)
    print(f"compile+first batch (prune={prune}): {time.time()-t0:.1f}s",
          flush=True)

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        digit, carry = bs2.add_with_carry(params, ctx, bkey, lx, ly,
                                          prune=prune)
    jax.block_until_ready(digit.a)
    dt = (time.time() - t0) / iters
    rate = batch / dt

    z = x[idx] + y[idx]
    got_d = np.asarray(bs2.decrypt_lwe(sk, digit))
    got_c = np.asarray(bs2.decrypt_lwe(sk, carry))
    ok = (got_d == z % 2**k).all() and (got_c == z // 2**k).all()
    if not ok:
        print("FAIL: wrong digit/carry", file=sys.stderr)
        sys.exit(1)
    nd = np.abs(np.asarray(bs2.lwe_phase_noise(sk, digit, jnp.asarray(z % 2**k))))
    nc = np.abs(np.asarray(bs2.lwe_phase_noise(sk, carry, jnp.asarray(z // 2**k))))
    print(
        f"scheme2 add_with_carry k={k} prune={prune}: {batch} adds in "
        f"{dt*1e3:.1f} ms -> "
        f"{rate:.1f} adds/s (digit+carry verified); max |noise| "
        f"{max(nd.max(), nc.max())} vs boundary {params.Dr // 2}",
        flush=True,
    )

    # k-bit multiplication (quarter-squares, 3 rotation rounds / 7 lanes)
    t0 = time.time()
    lo, hi = bs2.mul(params, ctx, bkey, lx, ly)
    jax.block_until_ready(lo.a)
    print(f"mul compile+first batch: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        lo, hi = bs2.mul(params, ctx, bkey, lx, ly)
    jax.block_until_ready(lo.a)
    dt = (time.time() - t0) / iters
    prod = x[idx] * y[idx]
    got_lo = np.asarray(bs2.decrypt_lwe(sk, lo))
    got_hi = np.asarray(bs2.decrypt_lwe(sk, hi))
    if not ((got_lo == prod % 2**k).all() and (got_hi == prod // 2**k).all()):
        print("FAIL: wrong product digits", file=sys.stderr)
        sys.exit(1)
    nl = np.abs(np.asarray(bs2.lwe_phase_noise(sk, lo, jnp.asarray(prod % 2**k))))
    nh = np.abs(np.asarray(bs2.lwe_phase_noise(sk, hi, jnp.asarray(prod // 2**k))))
    print(
        f"scheme2 mul k={k}: {batch} muls in {dt*1e3:.1f} ms -> "
        f"{batch/dt:.1f} muls/s (lo+hi digits verified); max |noise| "
        f"{max(nl.max(), nh.max())} vs boundary {params.Dr // 2}",
        flush=True,
    )

    # wide subtraction + comparison (models/wideint.py): W-digit two's
    # complement — W rotations yield diff AND the [x >= y] flag
    from sgfhe_tpu.models import wideint as wi

    W = 3
    B = min(batch, params.n)
    xw = rng.integers(0, 2 ** (k * W), B)
    yw = rng.integers(0, 2 ** (k * W), B)
    yw[0] = xw[0]  # force one tie
    xs = wi.encrypt_wide(sk, jax.random.key(5), xw, W)
    ys = wi.encrypt_wide(sk, jax.random.key(6), yw, W)
    t0 = time.time()
    diff, ge = wi.sub_wide(params, ctx, bkey, xs, ys)
    jax.block_until_ready(ge.a)
    print(f"sub compile+first batch: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        diff, ge = wi.sub_wide(params, ctx, bkey, xs, ys)
    jax.block_until_ready(ge.a)
    dt = (time.time() - t0) / iters
    if not (
        (wi.decrypt_wide(sk, diff) == (xw - yw) % 2 ** (k * W)).all()
        and (np.asarray(bs2.decrypt_lwe(sk, ge)) == (xw >= yw)).all()
    ):
        print("FAIL: wrong difference / >= flag", file=sys.stderr)
        sys.exit(1)
    print(
        f"scheme2 sub_wide k={k} W={W}: {B} subs in {dt*1e3:.1f} ms -> "
        f"{B/dt:.1f} subs/s (diff + [x>=y] flag verified)",
        flush=True,
    )

    # encrypted min/max (one ge_wide comparison + one shared 4W-lane mux)
    t0 = time.time()
    mins, maxs = wi.min_max_wide(params, ctx, bkey, xs, ys)
    jax.block_until_ready(maxs[0].a)
    print(f"min_max compile+first batch: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(iters):
        mins, maxs = wi.min_max_wide(params, ctx, bkey, xs, ys)
    jax.block_until_ready(maxs[0].a)
    dt = (time.time() - t0) / iters
    if not (
        (wi.decrypt_wide(sk, mins) == np.minimum(xw, yw)).all()
        and (wi.decrypt_wide(sk, maxs) == np.maximum(xw, yw)).all()
    ):
        print("FAIL: wrong min/max", file=sys.stderr)
        sys.exit(1)
    print(
        f"scheme2 min_max_wide k={k} W={W}: {B} pairs in {dt*1e3:.1f} ms -> "
        f"{B/dt:.1f} min+max/s (both extrema verified)",
        flush=True,
    )


if __name__ == "__main__":
    main()
