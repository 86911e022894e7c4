"""Counter-based cryptographic PRG for randomized flattening masks.

Threefry-2x32 (Salmon, Moraes, Dror, Shaw: "Parallel Random Numbers: As Easy
as 1, 2, 3", SC'11) — a pure ARX (add/rotate/xor) block cipher on two 32-bit
words, ideal for TPU uint32 lanes: no multiplies, no lane crossings, fully
vectorizable, and usable verbatim inside Pallas kernel bodies and in plain
jnp graphs, which is what lets the fused and jnp randomized-flatten paths
draw the SAME mask stream bit-for-bit.

The production round count is 13: Threefry-2x32-13 passes the full BigCrush
battery (SC'11 paper, Table 2 lists 13 as the minimal full-quality round
count for 2x32 with safety margin already included; the reference Random123
default of 20 adds further margin). `threefry2x32(..., rounds=20)` is the
standard cipher and is tested against an independent oracle; the repo uses
`MASK_ROUNDS` everywhere so the margin can be raised in one place.

This replaces the round-3 splitmix-hash masks (`_mix32`) — the reference's
own PRG carries an in-code TODO for SHAKE (src/utils.jl:63-68); a real ARX
cipher beats that posture instead of inheriting it.

Stream layout for flatten masks (one documented global coordinate system,
identical for every backend, batch tile size, and kernel):

    key     = (seed_lo, seed_hi)   two uint32 words from the caller's PRNG key
    ctr0    = gate * m + coeff     gate = GLOBAL batch index, coeff in [0, m)
    ctr1    = (step * 2 + op) * ceil(L/2) + pair
              step = blind-rotation step k (pack stage uses step = n),
              op   = 0 for the a-operand flatten, 1 for b,
              pair = digit pair index (each 64-bit block masks digits
              2*pair and 2*pair + 1)

Each (key, ctr) pair is visited at most once per bootstrap call, so masks
are independent uniform draws; the per-digit window truncation
(ops/rns.mask_window_bits) keeps them exactly uniform over [-2^k, 2^k).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Rotation schedule for Threefry-2x32 (Random123 R_32x2) and the Skein key
# parity constant truncated to 32 bits.
_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)

#: Rounds used for flatten masks: BigCrush-clean minimum for 2x32 (SC'11).
MASK_ROUNDS = 13


def _rotl(x, r: int):
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def threefry2x32(k0, k1, c0, c1, rounds: int = MASK_ROUNDS):
    """Threefry-2x32 block cipher: key (k0, k1), counter (c0, c1) -> two
    uint32 output words. Inputs may be scalars or arrays (normal jnp
    broadcasting); all arithmetic is uint32 add/rotate/xor, safe inside
    Pallas kernel bodies."""
    k0 = jnp.asarray(k0, jnp.uint32) if not hasattr(k0, "dtype") else k0.astype(jnp.uint32)
    k1 = jnp.asarray(k1, jnp.uint32) if not hasattr(k1, "dtype") else k1.astype(jnp.uint32)
    ks = (k0, k1, k0 ^ k1 ^ _PARITY)
    x0 = jnp.asarray(c0, jnp.uint32) + ks[0]
    x1 = jnp.asarray(c1, jnp.uint32) + ks[1]
    for i in range(rounds):
        x0 = x0 + x1
        x1 = _rotl(x1, _ROT[i % 8]) ^ x0
        if (i + 1) % 4 == 0:
            j = (i + 1) // 4
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + np.uint32(j)
    return x0, x1


def mask_stream_c1(step, op: int, pair: int, num_pairs: int):
    """The ctr1 word of the flatten-mask stream (see module docstring).
    `step` may be a traced uint32 scalar; op/pair/num_pairs are static."""
    s = step if hasattr(step, "astype") else jnp.uint32(step)
    return (
        s.astype(jnp.uint32) * np.uint32(2) + np.uint32(op)
    ) * np.uint32(num_pairs) + np.uint32(pair)
