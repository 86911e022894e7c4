"""Compile-cache priming (cold-start ergonomics).

The first bootstrap at Params(512)/Params(1024) pays minutes of Mosaic
kernel compilation (RESULTS.md: ~133-156 s at n=512/tile 16) plus tens of
seconds of context/key setup, silently. `prewarm(params)` runs one batch of
ZERO-VALUED operands through the exact production dispatch path
(models/bootstrap.bootstrap_batch) for the requested modes, so every XLA +
Mosaic artifact lands in the persistent compile cache before real keys or
data exist — values are irrelevant to compilation, so the key material is
all-zeros and costs nothing to fabricate. Stage progress is narrated to
stderr (utils/progress; SGFHE_PROGRESS=0 silences it).

Usage:  python -c "import sgfhe_tpu as F; F.prewarm(F.Params.create(512))"
or from code before the service takes traffic. Pair with
jax.config.update("jax_compilation_cache_dir", ...) (bench.py shows the
recipe) so the warmed artifacts persist across processes.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from .utils import progress


def prewarm(
    params,
    ctx=None,
    batch: int | None = None,
    modes: tuple[str, ...] = ("deterministic", "randomized"),
    verbose: bool = True,
) -> dict:
    """Prime the compile cache for `params`. Returns per-stage seconds.

    batch: the production batch size (the XLA executable is shape-
    specialized, so warm with the size you will run; defaults to the bench
    sizes: 8192 for n=64, 64 for n=512, 16 for n=1024+).
    """
    from . import make_context
    from .models import bootstrap as bs
    from .models.scheme1 import LWE

    if verbose:
        progress.enable(True)
    n, m = params.n, params.m
    l, L = params.num_digits, params.num_limbs
    if batch is None:
        batch = 8192 if n <= 64 else (64 if n <= 512 else 16)
    timings: dict[str, float] = {}

    t0 = time.time()
    if ctx is None:
        with progress.stage(f"make_context n={n} (tables for m={m}, L={L})"):
            ctx = make_context(params)
    timings["context"] = time.time() - t0

    # all-zero stand-ins: compilation depends on shapes/dtypes only
    bkey_hat = jnp.zeros((n, 2 * l, 2, L, m), jnp.uint32)
    bkey_shoup = jnp.zeros_like(bkey_hat)
    lwe = LWE(
        jnp.zeros((batch, n), jnp.uint32), jnp.zeros((batch,), jnp.uint32)
    )
    for mode in modes:
        fk = jax.random.key(0) if mode == "randomized" else None
        with progress.stage(
            f"compile+run bootstrap n={n} batch={batch} {mode} "
            f"(Mosaic kernel compile happens here)"
        ) as st:
            out = bs.bootstrap_batch(
                params, ctx, bkey_hat, bkey_shoup, lwe, lwe,
                fk, fk is not None,
            )
            jax.block_until_ready(out[0].a)
        timings[mode] = time.time() - st.t
    progress.log(
        f"prewarm(n={n}) complete; artifacts cached "
        f"({', '.join(f'{k}={v:.1f}s' for k, v in timings.items())})"
    )
    return timings
