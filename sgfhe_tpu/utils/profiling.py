"""Profiling / timing harness (SURVEY.md §5: the reference's only tracing is
BenchmarkTools in perf testcases, test/performance.test.jl; here it is a
library facility).

- `timeit(fn, *args)`   — wall-clock a jitted callable with proper
                          `block_until_ready` fencing and warmup.
- `trace(path)`         — context manager around the JAX profiler; view the
                          result with TensorBoard or Perfetto.
- `op_cost(params)`     — analytic per-gate cost model of the fused
                          blind-rotation kernel in Shoup-multiply
                          equivalents (SME) + key bytes streamed, for
                          roofline utilization against `measure_sme_rate`.
- `measure_sme_rate()`  — microbenchmark of the device's achievable
                          Shoup-multiply rate (the VPU uint32 ceiling).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp


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


# Op weights in Shoup-multiply equivalents. One shoup_mul = mulhi (4 u16
# multiplies + ~6 adds/shifts) + 2 low multiplies + subtract + select ≈ 15
# elementary u32 VPU ops; the others are scaled against that.
_W_SHOUP = 1.0
_W_MODU32 = 0.6     # mulhi + mul + 2 cond-subtracts
_W_ADDSEL = 0.15    # add/sub/compare/select


@dataclass(frozen=True)
class GateCost:
    sme_per_gate: float        # Shoup-multiply equivalents per gate (3 gates)
    ntt_transforms: int        # length-m limb-transforms per gate
    key_bytes: int             # bootstrap-key bytes (values + Shoup)
    acc_bytes: int             # accumulator working set per gate


def op_cost(params, prune: int = 0) -> GateCost:
    """Analytic per-gate cost of one bootstrap pass through the fused kernel
    (ops/fused.py): n steps of [flatten x2, fwd NTT on 2(l-prune) digit
    rows, gadget accumulation, monomial ladder, inv NTT on 2 columns].
    prune models the approximate-gadget fast mode (dropped rows cost no
    NTT/key-mul/embed work; the extraction chain still peels them)."""
    n, l, L, m = params.n, params.num_digits, params.num_limbs, params.m
    m1 = max(1, m // 128)
    S = m.bit_length() - 1
    maj = m1.bit_length() - 1          # butterfly stages (1 shoup / 2 elems)
    lane = S - maj                     # roll+select stages (1 shoup / elem)
    p_bits = max(params.moduli).bit_length()
    # lazy-reduction resets: bound doubles per stage, reset when 2*c*p > 2^32
    reset_every = max(1, 31 - p_bits)

    elems = L * m                      # one limb-spread polynomial
    # forward NTT per row: pre-twist + stages + periodic Barrett resets
    fwd_row = (
        elems * _W_SHOUP
        + maj * (elems / 2 * _W_SHOUP + elems * 2 * _W_ADDSEL)
        + lane * (elems * _W_SHOUP + elems * 3 * _W_ADDSEL)
        + (S / reset_every) * elems * _W_MODU32
    )
    inv_col = fwd_row  # same stage structure + post-twist ~ pre-twist
    # flatten (a and b): extraction chain on single-limb rows + re-embed
    lk = l - prune                     # kept digit rows per operand
    chain = sum(i for i in range(L)) * (m * (_W_SHOUP + _W_MODU32 + _W_ADDSEL))
    embed = lk * (elems * (_W_MODU32 + _W_ADDSEL))
    flatten2 = 2 * (chain + embed)
    # gadget accumulation: 2lk rows x 2 cols key muls + lk x 2 w-muls + adds
    accum = (2 * lk * 2 + lk * 2) * elems * (_W_SHOUP + _W_ADDSEL)
    # monomial ladder: log2(2m) shoup+select on 2 columns
    ladder = 2 * (2 * m).bit_length() * elems * (_W_SHOUP + 2 * _W_ADDSEL)

    per_step = flatten2 + 2 * lk * fwd_row + accum + ladder + 2 * inv_col
    return GateCost(
        sme_per_gate=n * per_step,
        ntt_transforms=n * (2 * lk + 2) * L,
        key_bytes=n * (2 * lk) * 2 * L * m * 4 * 2,
        acc_bytes=2 * L * m * 4,
    )


def measure_sme_rate(batch: int = 1 << 19, chain: int = 64, lanes: int = 16,
                     iters: int = 10) -> float:
    """Measured Shoup multiplies/second on the attached device: `lanes`
    INDEPENDENT chains of dependent shoup_muls over a 512K-element array
    (~270M multiplies per call). The independent chains give the VPU
    instruction-level parallelism inside each fused block — a single chain
    measures op latency, not throughput. Launch overhead and HBM traffic are
    both negligible at this size. This is the denominator of the bootstrap's
    VPU-roofline utilization."""
    from ..ops import modmath as mm

    p = jnp.uint32((1 << 27) + 1)
    w = jnp.uint32(12345)
    ws = jnp.uint32((12345 << 32) // ((1 << 27) + 1))
    x = jnp.arange(batch, dtype=jnp.uint32) % p

    @jax.jit
    def f(x):
        ys = [x + jnp.uint32(i) for i in range(lanes)]
        for _ in range(chain):
            ys = [mm.shoup_mul(y, w, ws, p) for y in ys]
        acc = ys[0]
        for y in ys[1:]:
            acc = acc ^ y
        return acc

    dt, _ = timeit(f, x, iters=iters, warmup=2)
    return batch * chain * lanes / dt
