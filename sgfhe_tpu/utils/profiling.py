"""Profiling / timing harness (SURVEY.md §5: the reference's only tracing is
BenchmarkTools in perf testcases, test/performance.test.jl; here it is a
library facility).

- `timeit(fn, *args)`   — wall-clock a jitted callable with proper
                          `block_until_ready` fencing and warmup.
- `trace(path)`         — context manager around the JAX profiler; view the
                          result with TensorBoard or Perfetto.
- `op_cost(params)`     — analytic per-gate cost model of the bootstrap
                          (transform counts, multiply counts, key bytes
                          streamed), for roofline sanity checks against
                          measured numbers.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax


def timeit(fn, *args, iters: int = 5, warmup: int = 1):
    """(seconds_per_call, last_result); fences device work each iteration."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


@contextlib.contextmanager
def trace(path: str):
    """Capture a device trace: `with trace('/tmp/sgfhe-trace'): run()`."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass(frozen=True)
class GateCost:
    ntt_transforms: int        # length-m NTTs per gate (fwd + inv, all steps)
    shoup_muls: int            # modular multiplies per gate (approximate)
    key_bytes_streamed: int    # bootstrap-key bytes read per gate batch tile
    vmem_tile_bytes: int       # accumulator working set per gate


def op_cost(params) -> GateCost:
    """Analytic per-gate cost of one bootstrap pass (all three gates)."""
    n, l, L, m = params.n, params.num_digits, params.num_limbs, params.m
    S = m.bit_length() - 1
    transforms = n * (2 * l + 2) * L
    # per limb-transform: S stages x 1 mul; plus ladder/accum terms
    ladder = n * 2 * L * m * (2 * m).bit_length()
    accum = n * 2 * (2 * l + l) * L * m
    muls = transforms * S * m // 2 * 2 + ladder + accum
    key_bytes = n * (2 * l) * 2 * L * m * 4 * 2
    return GateCost(
        ntt_transforms=transforms,
        shoup_muls=muls,
        key_bytes_streamed=key_bytes,
        vmem_tile_bytes=2 * L * m * 4,
    )
