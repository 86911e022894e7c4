"""Scaling-efficiency harness: bootstrap gates/s vs device count
(BASELINE.md: >= 80% efficiency target at >= 2 hosts).

On real hardware run this on the pod (devices are chips); without hardware
it runs on virtual CPU devices (XLA_FLAGS=--xla_force_host_platform_device_
count=8), where the efficiency numbers are indicative only — virtual
devices share the same physical cores, so ideal scaling is NOT expected
there; what the run proves is that every mesh size compiles and computes
correctly.

Usage: python examples/scaling.py [batch=256] [n=64]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--virtual" in sys.argv or os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # effective even when a TPU plugin was wired in at interpreter start
    # (sitecustomize), as long as no backend has initialized yet
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

import sgfhe_tpu as F  # noqa: E402
from sgfhe_tpu.parallel import distributed  # noqa: E402


def main(batch=256, n=64):
    params = F.Params.create(n)
    ctx = F.make_context(params)
    key = jax.random.key(0)
    k_sk, k_bk, k_a, k_b = jax.random.split(key, 4)
    sk = F.PrivateKey.create(params, k_sk)
    bkey = F.BootstrapKey.create(ctx, sk, k_bk)
    a1 = jax.random.randint(k_a, (batch, n), 0, params.r, dtype=jnp.int32).astype(
        jnp.uint32
    )
    a2 = jax.random.randint(k_b, (batch, n), 0, params.r, dtype=jnp.int32).astype(
        jnp.uint32
    )
    lwe1 = F.LWE(a1, a1[:, 0])
    lwe2 = F.LWE(a2, a2[:, 0])
    print(
        f"devices: {len(jax.devices())} x {jax.devices()[0].platform}, "
        f"batch {batch}, Params({n})"
    )
    distributed.scaling_report(
        params, ctx, bkey, lwe1, lwe2, out=sys.stdout
    )


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 256
    n = int(args[1]) if len(args) > 1 else 64
    main(batch, n)
