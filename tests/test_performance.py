"""Performance testcases mirroring the reference's BenchmarkTools tier
(test/performance.test.jl, tagged :performance and excluded from the default
run — here via the `perf` marker). Like the reference they REPORT timings
rather than assert thresholds (machine-dependent), but they do assert
correctness of what they time.

Run: pytest tests/test_performance.py -m perf --override-ini addopts= -s
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu.ops import ntt as ntt_mod, rns as rns_mod
from sgfhe_tpu.utils import profiling


pytestmark = pytest.mark.perf


@pytest.mark.parametrize("n", [64, 1024])
def test_flatten_latency(n):
    """Reference test/performance.test.jl:27-78: flatten at Params(64)
    (Q <= 64-bit) and Params(1024) (Q <= 96-bit) widths."""
    params = F.Params.create(n)
    host = rns_mod.build_context(params.moduli)
    ctx = host.device_context()
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        np.stack([rng.integers(0, p, (params.m,)) for p in params.moduli])
        .astype(np.uint32)
    )
    f = jax.jit(lambda v: rns_mod.flatten(ctx, v))
    dt, out = profiling.timeit(f, x, iters=20)
    assert out.shape == (params.num_digits, params.num_limbs, params.m)
    print(f"\nflatten Params({n}) [{params.Q.bit_length()}-bit Q, "
          f"{params.num_limbs} limbs]: {dt*1e6:.1f} us/poly")


def test_external_product_latency():
    """Reference test/performance.test.jl:81-111: one external-product step
    (flatten + 2l forward NTTs + gadget accumulation + 2 inverse NTTs)."""
    params = F.Params.create(64)
    ctx = F.make_context(params)
    key = jax.random.key(0)
    sk = F.PrivateKey.create(params, key)
    bkey = F.BootstrapKey.create(ctx, sk, jax.random.key(1))
    from sgfhe_tpu.models import bootstrap as bs

    rng = np.random.default_rng(2)
    B = 64
    acc = jnp.asarray(
        rng.integers(0, min(params.moduli), (B, params.num_limbs, params.m))
        .astype(np.uint32)
    )
    u = jnp.asarray(rng.integers(0, params.r, (B,)).astype(np.uint32))

    @jax.jit
    def step(a, b, u):
        return bs._external_step(
            params, ctx, a, b, bkey.hat[0], bkey.hat_shoup[0], u, None
        )

    dt, _ = profiling.timeit(step, acc, acc, u, iters=10)
    print(f"\nexternal_product Params(64) batch={B}: "
          f"{dt*1e6/B:.1f} us/product")


def test_bootstrap_latency():
    """Reference test/performance.test.jl:114-139: one full bootstrap pass
    (AND+OR+XOR), with decrypt-checked outputs."""
    params = F.Params.create(64)
    ctx = F.make_context(params)
    k = jax.random.split(jax.random.key(7), 4)
    sk = F.PrivateKey.create(params, k[0])
    bkey = F.BootstrapKey.create(ctx, sk, k[1])
    msg = np.asarray(jax.random.bernoulli(k[2], 0.5, (params.n,)))
    bits = F.split_ciphertext(F.encrypt(sk, k[3], jnp.asarray(msg)))
    lwe1 = F.LWE(bits.lwe.a[0::2], bits.lwe.b[0::2])
    lwe2 = F.LWE(bits.lwe.a[1::2], bits.lwe.b[1::2])

    def run():
        return F.bootstrap_batch(
            params, ctx, bkey.hat, bkey.hat_shoup, lwe1, lwe2
        )

    dt, out = profiling.timeit(run, iters=5)
    got = np.asarray(F.decrypt_bit(sk, F.EncryptedBit(out[0])))
    np.testing.assert_array_equal(got, msg[0::2] & msg[1::2])
    batch = lwe1.a.shape[0]
    print(f"\nbootstrap Params(64) batch={batch}: {dt*1e3:.1f} ms "
          f"-> {batch/dt:.0f} gates/s ({jax.devices()[0].platform})")
