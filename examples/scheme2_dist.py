"""Scheme-2 k=4/k=5 add_with_carry through the tensor-parallel rotation
with a REAL chunked bootstrap key, end-to-end on the 8-device virtual CPU
mesh — the giant-key path for the parameter sets that exceed one chip's HBM
(k=5 key: 17.2 GiB hat+shoup > v5e's 16 GiB; reference parameter surface
src/fhe2.jl:36-39).

This is the round-5 acceptance run for VERDICT item 2: no truncated
synthetic keys — full keygen (chunked, BootstrapKey.KEY_CHUNK), key
conversion to the dist-hat order, one add_with_carry_dist batch, decryption
checked digit-and-carry, phase noise reported against the Dr/2 boundary.
Virtual CPU devices share two host cores, so the wall-clock here measures
nothing; hardware rates for the same code path are the single-chip rows in
RESULTS.md (correctness is the point of this run).

Usage: python examples/scheme2_dist.py [k] [batch] [prune]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU mesh BEFORE any jax backend touch (the axon plugin would grab the TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
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
from sgfhe_tpu.parallel import mesh as mesh_mod
from sgfhe_tpu.parallel import rotate_dist as rd


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    prune = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    assert len(jax.devices()) == 8, jax.devices()

    t0 = time.time()
    params = s2.Params.create(k)
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
    gib = bkey.hat.size * 8 / 2**30
    print(
        f"BootstrapKey (chunked, real): {gib:.1f} GiB hat+shoup "
        f"[{time.time()-t0:.1f}s]",
        flush=True,
    )

    # dist-hat conversion; the single-device Shoup column is not needed
    m2 = 128
    m1 = params.m // m2
    t0 = time.time()
    rplan = rd.build_rotation_plan(params.moduli, m1, m2)
    hat_np = np.asarray(bkey.hat)
    del bkey  # free the single-device shoup column (same size as the hat)
    hat_d, shoup_d = rd.bkey_to_dist(ctx, rplan, jnp.asarray(hat_np), prune)
    del hat_np
    print(f"bkey_to_dist (m1={m1}, m2={m2}): [{time.time()-t0:.1f}s]", flush=True)

    mesh = mesh_mod.make_mesh(dp=1, tp=8)
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
    digit, carry = rd.add_with_carry_dist(
        params, ctx, rplan, mesh, jnp.asarray(hat_d), jnp.asarray(shoup_d),
        lx, ly, prune=prune,
    )
    jax.block_until_ready(digit.a)
    print(f"add_with_carry_dist batch {batch}: [{time.time()-t0:.1f}s]",
          flush=True)

    z = x[idx] + y[idx]
    dd = np.asarray(bs2.decrypt_lwe(sk, digit))
    cc = np.asarray(bs2.decrypt_lwe(sk, carry))
    assert (dd == z % 2**k).all(), f"digit mismatch: {dd} vs {z % 2**k}"
    assert (cc == z // 2**k).all(), f"carry mismatch: {cc} vs {z // 2**k}"
    noise = np.asarray(bs2.lwe_phase_noise(sk, digit, jnp.asarray(z % 2**k)))
    print(
        f"PASS k={k} dist (tp=8, prune={prune}): digit+carry decrypt-verified on {batch} "
        f"adds; max |noise| {np.abs(noise).max()} vs boundary Dr/2 = "
        f"{params.Dr // 2}",
        flush=True,
    )


if __name__ == "__main__":
    main()
