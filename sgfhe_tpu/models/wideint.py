"""Encrypted wide-integer arithmetic over scheme-2 digits (eprint 2019/521).

The point of the k-bit scheme is arithmetic on WIDE integers represented as
base-2^k digit vectors (paper §1). This module composes the functional
bootstrap (models/bootstrap2.py) into batched wide ops:

 - numbers are little-endian lists of W digit ciphertexts, each an (B, n)
   LWE batch (B independent integers per op);
 - `add_wide`: ripple-carry via `add_with_carry` — W rotations, returns
   W+1 digits;
 - `mul_wide`: schoolbook — ALL W² digit products run as one batched
   `mul` call (3 rotation rounds regardless of W), then column sums with
   carry propagation via pairwise `add_with_carry`;
 - every output digit is a refreshed ciphertext, so results chain into
   further arithmetic indefinitely (the depth soak in the tests).

The reference's scheme-2 module has no homomorphic ops at all
(src/fhe2.jl:6); this is capability beyond the reference.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .scheme1 import LWE
from .scheme2 import Params, Scheme2Context, PrivateKey, BootstrapKey
from . import bootstrap2 as bs2


def encrypt_wide(
    sk: PrivateKey, key: jax.Array, values, width: int
) -> list[LWE]:
    """Encrypt B integers in [0, 2^(k*width)) as `width` base-2^k digit
    ciphertext batches. values: (B,) ints; B <= n."""
    from . import scheme2 as s2

    params = sk.params
    k = params.k
    values = np.asarray(values, dtype=np.int64)
    B = values.shape[0]
    assert B <= params.n
    assert (values >= 0).all() and (values < 2 ** (k * width)).all()
    digits = []
    keys = jax.random.split(key, width)
    for j in range(width):
        msg = np.zeros(params.n, dtype=np.int64)
        msg[:B] = (values >> (k * j)) & (2**k - 1)
        a, b = s2.encrypt(sk, keys[j], jnp.asarray(msg))
        lw = bs2.split_ciphertext(params, a, b)
        digits.append(LWE(lw.a[:B], lw.b[:B]))
    return digits


def decrypt_wide(sk: PrivateKey, digits: list[LWE]) -> np.ndarray:
    """Decrypt a digit-vector ciphertext back to (B,) integers."""
    k = sk.params.k
    out = None
    for j, d in enumerate(digits):
        v = np.asarray(bs2.decrypt_lwe(sk, d)).astype(np.int64)
        out = v << (k * j) if out is None else out + (v << (k * j))
    return out


def _zero_like(lwe: LWE) -> LWE:
    """Trivial (noiseless, keyless) encryption of 0."""
    return LWE(jnp.zeros_like(lwe.a), jnp.zeros_like(lwe.b))


def add_wide(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    xs: list[LWE],
    ys: list[LWE],
    flat_key=None,
    prune: int = 0,
) -> list[LWE]:
    """Ripple-carry addition of two W-digit numbers -> W+1 digits (the last
    is the carry-out bit). W sequential rotations, each batched over B."""
    W = len(xs)
    assert len(ys) == W
    if flat_key is not None:
        keys = list(jax.random.split(flat_key, W))
    else:
        keys = [None] * W
    carry = None
    out = []
    for j in range(W):
        d, carry = bs2.add_with_carry(
            params, ctx, bkey, xs[j], ys[j], carry, keys[j], prune=prune
        )
        out.append(d)
    out.append(carry)
    return out


def mul_wide(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    xs: list[LWE],
    ys: list[LWE],
    flat_key=None,
    prune: int = 0,
) -> list[LWE]:
    """Schoolbook multiplication of two W-digit numbers -> 2W digits.

    All W² digit products run as ONE batched quarter-squares `mul` (3
    rotation rounds total); the partial-product columns then reduce with
    pairwise add_with_carry, feeding carry bits into the next column. The
    final carry out of column 2W-1 is provably zero ((2^{kW}-1)² < 2^{2kW})
    and is dropped."""
    W = len(xs)
    assert len(ys) == W
    B = xs[0].a.shape[0]
    key_state = [flat_key]

    def next_key():
        if key_state[0] is None:
            return None
        key_state[0], sub = jax.random.split(key_state[0])
        return sub

    # one batched mul over all (i, j) digit pairs: lanes (i*W + j)-major
    l1 = LWE(
        jnp.concatenate([xs[i].a for i in range(W) for _ in range(W)]),
        jnp.concatenate([xs[i].b for i in range(W) for _ in range(W)]),
    )
    l2 = LWE(
        jnp.concatenate([ys[j].a for _ in range(W) for j in range(W)]),
        jnp.concatenate([ys[j].b for _ in range(W) for j in range(W)]),
    )
    lo, hi = bs2.mul(params, ctx, bkey, l1, l2, next_key(), prune=prune)

    cols: list[list[LWE]] = [[] for _ in range(2 * W + 1)]
    for i in range(W):
        for j in range(W):
            s = slice((i * W + j) * B, (i * W + j + 1) * B)
            cols[i + j].append(LWE(lo.a[s], lo.b[s]))
            cols[i + j + 1].append(LWE(hi.a[s], hi.b[s]))

    out = []
    for c in range(2 * W):
        pend = cols[c]
        while len(pend) > 1:
            a = pend.pop()
            b = pend.pop()
            d, carry = bs2.add_with_carry(
                params, ctx, bkey, a, b, None, next_key(), prune=prune
            )
            pend.append(d)
            cols[c + 1].append(carry)
        out.append(pend[0] if pend else _zero_like(out[0]))
    return out


# ---------------------------------------------------------------------------
# Subtraction and comparison (two's complement over base-2^k digits)
# ---------------------------------------------------------------------------


def _trivial_const(params: Params, batch_shape, value: int) -> LWE:
    """Noiseless trivial encryption of a constant digit (a = 0,
    b = value*Dr) — the scheme-2 analog of the reference's trivial
    LWE(0, Dr) in pack_encrypted_bits (src/fhe.jl:670-671)."""
    b = jnp.full(
        batch_shape, (value * params.Dr) % params.r, dtype=jnp.uint32
    )
    a = jnp.zeros(tuple(batch_shape) + (params.n,), dtype=jnp.uint32)
    return LWE(a, b)


def complement_digit(params: Params, lwe: LWE) -> LWE:
    """(2^k - 1) - d, computed LINEARLY (negate mod r and add a constant;
    no bootstrap, noise magnitude unchanged)."""
    mask = jnp.uint32(params.mask_r)
    c = jnp.uint32(((2**params.k - 1) * params.Dr) & params.mask_r)
    return LWE((-lwe.a) & mask, (c - lwe.b) & mask)


def flag_not(params: Params, lwe: LWE) -> LWE:
    """1 - f for a 0/1 flag digit, linear (no bootstrap)."""
    mask = jnp.uint32(params.mask_r)
    return LWE((-lwe.a) & mask, (jnp.uint32(params.Dr) - lwe.b) & mask)


def sub_wide(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    xs: list[LWE],
    ys: list[LWE],
    flat_key=None,
    prune: int = 0,
) -> tuple[list[LWE], LWE]:
    """Two's-complement subtraction: x - y = x + comp(y) + 1 digit-wise.

    Returns (diff, ge): diff = (x - y) mod 2^{kW} as W refreshed digits and
    ge = the final carry, an encrypted [x >= y] flag (carry-out == no
    borrow). Same cost as add_wide: W rotations, each batched over B.
    Digit sums stay in [0, 2^{k+1}) — the same combined domain
    add_with_carry already evaluates over."""
    W = len(xs)
    assert len(ys) == W
    if flat_key is not None:
        keys = list(jax.random.split(flat_key, W))
    else:
        keys = [None] * W
    carry = _trivial_const(params, xs[0].b.shape, 1)
    out = []
    for j in range(W):
        d, carry = bs2.add_with_carry(
            params, ctx, bkey, xs[j], complement_digit(params, ys[j]),
            carry, keys[j], prune=prune,
        )
        out.append(d)
    return out, carry


def ge_wide(params, ctx, bkey, xs, ys, flat_key=None, prune: int = 0) -> LWE:
    """Encrypted [x >= y] flag (W rotations; the diff digits are free but
    discarded)."""
    return sub_wide(params, ctx, bkey, xs, ys, flat_key, prune)[1]


def flag_and(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    f1: LWE,
    f2: LWE,
    flat_key=None,
    prune: int = 0,
) -> LWE:
    """AND of two 0/1 flag digits in ONE rotation: table [f1+f2 >= 2] over
    the combined domain (works for every k, including k=1 where 2 == 2^k)."""
    zmax = 2 ** (params.k + 1)
    tab = [1 if z >= 2 else 0 for z in range(zmax)]
    u = bs2._lwe_sum(params, f1, f2)
    th = bs2.tables_hat(params, ctx, [tab])
    out = bs2.bootstrap(params, ctx, bkey, u, th, flat_key, prune=prune)
    return LWE(out.a[:, 0], out.b[:, 0])


def _scale_flag(params: Params, flag: LWE) -> LWE:
    """2^k * flag (linear). Scales the flag's phase noise by 2^k, so the
    flag must be a REFRESHED ciphertext (a bootstrap output such as
    `ge_wide`'s carry, or a trivial constant): the mux phase noise is
    2^k*w_flag + w_digit, which stays inside the Dr/2 decision boundary for
    post-bootstrap noise levels (measured max 23 vs 256 at k=1, n=1024 —
    RESULTS.md) but not for arbitrarily noisy flags."""
    K = jnp.uint32(2**params.k)
    mask = jnp.uint32(params.mask_r)
    return LWE((flag.a * K) & mask, (flag.b * K) & mask)


def _mux_pass(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    flag: LWE,
    pairs: list[tuple[list[LWE], list[LWE]]],
    flat_key=None,
    prune: int = 0,
) -> list[list[LWE]]:
    """Shared mux engine: for each (xs, ys) pair and each digit j, compute
    flag ? xs[j] : ys[j]. ALL selections ride ONE batched rotation pass —
    2 lanes per (pair, digit): lane A has phase 2^k*f + x_j with table
    T_keep(z) = z - 2^k for z >= 2^k else 0 (-> f*x_j), lane B has phase
    2^k*f + y_j with T_drop(z) = z for z < 2^k else 0 (-> (1-f)*y_j); the
    result digit is the linear sum of the two refreshed outputs (noise 2x a
    fresh bootstrap output — still chainable into add/mul/compare)."""
    K = 2**params.k
    zmax = 2 * K
    sf = _scale_flag(params, flag)
    t_keep = [z - K if z >= K else 0 for z in range(zmax)]
    t_drop = [0 if z >= K else z for z in range(zmax)]
    th = bs2.tables_hat(params, ctx, [t_keep, t_drop])

    lanes_a, lanes_b, t_idx = [], [], []
    for xs, ys in pairs:
        assert len(xs) == len(ys)
        for xj, yj in zip(xs, ys):
            ua = bs2._lwe_sum(params, sf, xj)
            ub = bs2._lwe_sum(params, sf, yj)
            lanes_a.extend([ua.a, ub.a])
            lanes_b.extend([ua.b, ub.b])
            t_idx.extend([0, 1])
    u = LWE(jnp.concatenate(lanes_a), jnp.concatenate(lanes_b))
    B = pairs[0][0][0].a.shape[0]
    t0 = jnp.repeat(th[jnp.asarray(t_idx)], B, axis=0)
    fused = bs2._use_fused(params)
    out = bs2._bootstrap_paired_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, u, t0,
        flat_key is not None, fused, flat_key, prune,
    )
    results, lane = [], 0
    for xs, ys in pairs:
        sel = []
        for _ in xs:
            fa = LWE(out.a[lane * B:(lane + 1) * B],
                     out.b[lane * B:(lane + 1) * B])
            fb = LWE(out.a[(lane + 1) * B:(lane + 2) * B],
                     out.b[(lane + 1) * B:(lane + 2) * B])
            sel.append(bs2._lwe_sum(params, fa, fb))
            lane += 2
        results.append(sel)
    return results


def select_wide(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    flag: LWE,
    xs: list[LWE],
    ys: list[LWE],
    flat_key=None,
    prune: int = 0,
) -> list[LWE]:
    """Encrypted branchless select: flag ? x : y digit-wise, where `flag` is
    a refreshed 0/1 flag ciphertext (e.g. `ge_wide`/`eq_wide` output). ONE
    rotation pass with 2W lanes; every output digit is (the sum of two)
    refreshed ciphertexts. The data path never learns which branch was
    taken — the FHE analog of a cmov."""
    return _mux_pass(params, ctx, bkey, flag, [(xs, ys)], flat_key, prune)[0]


def min_max_wide(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    xs: list[LWE],
    ys: list[LWE],
    flat_key=None,
    prune: int = 0,
) -> tuple[list[LWE], list[LWE]]:
    """Encrypted (min, max) of two W-digit numbers: one `ge_wide` comparison
    (W rotations) + ONE shared mux pass with 4W lanes (both selections reuse
    the same encrypted flag). Total W+1 rotation passes."""
    if flat_key is not None:
        k1, k2 = jax.random.split(flat_key)
    else:
        k1 = k2 = None
    ge = ge_wide(params, ctx, bkey, xs, ys, k1, prune)
    mins, maxs = _mux_pass(
        params, ctx, bkey, ge, [(ys, xs), (xs, ys)], k2, prune
    )
    return mins, maxs


def _oddeven_pairs(N: int) -> list[tuple[int, int]]:
    """Comparator pairs of Batcher's odd-even mergesort network for N a
    power of two (N=4 -> 5 comparators, depth 3)."""
    assert N >= 2 and N & (N - 1) == 0
    pairs = []
    p = 1
    while p < N:
        k = p
        while k >= 1:
            for j in range(k % p, N - k, 2 * k):
                for i in range(min(k, N - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


def sort_wide(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    items: list[list[LWE]],
    flat_key=None,
    prune: int = 0,
) -> list[list[LWE]]:
    """Sort N encrypted W-digit numbers ascending, obliviously: a Batcher
    odd-even merge network of `min_max_wide` compare-exchanges (O(N log²N)
    comparators, each W+1 rotation passes batched over B). The execution
    trace is data-independent — neither the values nor their order ever
    leaves the ciphertexts. Every level's outputs are refreshed mux sums,
    so the network chains to any N."""
    N = len(items)
    pairs = _oddeven_pairs(N)
    if flat_key is not None:
        keys = list(jax.random.split(flat_key, len(pairs)))
    else:
        keys = [None] * len(pairs)
    items = list(items)
    for (i, j), fk in zip(pairs, keys):
        items[i], items[j] = min_max_wide(
            params, ctx, bkey, items[i], items[j], fk, prune
        )
    return items


def eq_wide(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    xs: list[LWE],
    ys: list[LWE],
    flat_key=None,
    prune: int = 0,
) -> LWE:
    """Encrypted [x == y] flag: ge(x,y) AND ge(y,x) — 2W+1 rotations."""
    if flat_key is not None:
        k1, k2, k3 = jax.random.split(flat_key, 3)
    else:
        k1 = k2 = k3 = None
    return flag_and(
        params, ctx, bkey,
        ge_wide(params, ctx, bkey, xs, ys, k1, prune),
        ge_wide(params, ctx, bkey, ys, xs, k2, prune),
        k3, prune,
    )
