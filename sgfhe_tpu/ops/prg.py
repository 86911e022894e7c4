"""Counter-based cryptographic PRG for randomized flattening masks.

Threefry-2x32 (Salmon, Moraes, Dror, Shaw: "Parallel Random Numbers: As Easy
as 1, 2, 3", SC'11) — a pure ARX (add/rotate/xor) block cipher on two 32-bit
words, ideal for TPU uint32 lanes: no multiplies, no lane crossings, fully
vectorizable, and usable verbatim inside Pallas kernel bodies and in plain
jnp graphs, which is what lets the fused and jnp randomized-flatten paths
draw the SAME mask stream bit-for-bit.

The production round count is 20 — the Random123 reference default for
Threefry-2x32 (and what jax.random's own threefry2x32 uses). Earlier rounds
of this repo used 13, citing the SC'11 paper's Table 2; that table's Crush
results cover 2x64/4x32/4x64, NOT 2x32, so the 13-round choice rested on a
misattributed citation (round-4 advisor finding). Since these masks back
the circuit-privacy randomized flatten, the full-margin standard cipher is
the only defensible default; the measured cost of the 7 extra ARX rounds is
negligible next to the NTT work (~1% of a randomized bootstrap). The repo
uses `MASK_ROUNDS` everywhere so the count is set in one place.

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
are independent uniform draws WITHIN a call; the per-digit window truncation
(ops/rns.mask_window_bits) keeps them exactly uniform over [-2^k, 2^k).

ACROSS calls, replay is prevented by a per-call EPOCH (round-4 weak-4): the
public entries (models/bootstrap.bootstrap_batch, pack_encrypted_bits,
models/bootstrap2.bootstrap/add_with_carry/apply_lut/refresh/mul,
parallel/rotate_dist.bootstrap_batch_tp) fold a fresh epoch word into the
caller's flat_key via `fold_epoch` before any mask is drawn, so two calls
with the SAME flat_key still draw disjoint streams. Pass an explicit
`epoch=<int>` to pin reproducibility (the rng-seeded determinism the
reference gets from reusing an rng object); internal entries
(bootstrap_internal, blind_rotate, the *_dist internals) take the key
as-is, which is what the bit-exactness tests compare.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# Rotation schedule for Threefry-2x32 (Random123 R_32x2) and the Skein key
# parity constant truncated to 32 bits.
_ROT = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)

#: Rounds used for flatten masks: the Random123/JAX standard for 2x32.
MASK_ROUNDS = 20


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


#: process-wide epoch counter for the public bootstrap entries (see module
#: docstring): each public randomized call consumes one epoch, so the same
#: flat_key can never silently replay a mask stream across calls.
import itertools as _itertools

_EPOCH = _itertools.count()


def fold_epoch(flat_key, epoch: "int | None" = None):
    """Derive the per-call mask key: fold an epoch word into flat_key.

    epoch=None (the default at every public entry) consumes the next value
    of the process-wide counter — distinct streams across calls, the safe
    default. An explicit int pins the stream for reproducible runs (two
    calls with the same (flat_key, epoch) are bit-identical). Returns None
    for flat_key=None (deterministic mode needs no masks)."""
    if flat_key is None:
        return None
    import jax

    if epoch is None:
        epoch = next(_EPOCH)
    return jax.random.fold_in(flat_key, epoch)


def mask_stream_c1(step, op: int, pair: int, num_pairs: int):
    """The ctr1 word of the flatten-mask stream (see module docstring).
    `step` may be a traced uint32 scalar; op/pair/num_pairs are static."""
    s = step if hasattr(step, "astype") else jnp.uint32(step)
    return (
        s.astype(jnp.uint32) * np.uint32(2) + np.uint32(op)
    ) * np.uint32(num_pairs) + np.uint32(pair)
