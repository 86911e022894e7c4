"""Scheme-2 functional gate bootstrap (eprint 2019/521, k-bit arithmetic).

**This goes beyond the reference's capability surface.** The reference
constructs `Scheme2.BootstrapKey` but never consumes it — src/fhe2.jl:6 marks
the module "Experimental module, not finished" and examples/test_scheme2.jl:26
only builds the key. This module implements the k-bit functional bootstrap
that key is *for*: programmable test vectors over the phase circle, giving

 - `bootstrap(...)`         — evaluate F arbitrary functions of one phase in
                              ONE batched blind rotation (each function is an
                              extra batch lane of the shared Pallas kernel);
 - `add_with_carry(...)`    — the paper's headline op: from encryptions of
                              x, y (and an optional carry) in [0, 2^k),
                              refreshed encryptions of (x+y+c) mod 2^k and of
                              the carry-out, in one rotation pass;
 - `apply_lut(...)`         — arbitrary unary digit function f: [0,2^k)->[0,2^k);
 - `refresh(...)`           — noise reset (identity LUT).

How the test vector is built (derivation anchored to the scheme-1 machinery,
whose orientation is verified bit-exactly against refimpl/golden.py):
after the rotation the accumulator is acc = T(x)·x^{-φ} with
φ = u.b − u.a·s = z·Dr + w (mod r = 2m), z the combined digit sum and
|w| < Dr/2 the phase noise. Extracting coefficient 0 yields an LWE whose
decryption is T̃(φ mod 2m), where T̃ is the negacyclic extension
(T̃(e) = T[e] for e < m, −T[e−m] above). So

    T[j] = f((j + Dr/2) ÷ Dr) · DQ        for j in [0, m − Dr/2)
    T[j] = (−f(0)) · DQ                   for j in [m − Dr/2, m)

the second band handling small NEGATIVE phases (z = 0, w < 0), which wrap to
e = 2m + w and pick up the negacyclic sign. Reachable sums z ≤ 2^{k+1} − 1
stay strictly below the band: max φ = (2^{k+1}−1)·Dr + Dr/2 − 1 = m − Dr/2 − 1.
Output scaling DQ = Q/2^{k+2} mirrors Dr = r/2^{k+2}, so the exact Q→r switch
(ops/rns.rescale_exact) lands the message on f(z)·Dr — a fresh scheme-2
ciphertext.

Noise: each rotation step adds ≤ 2l·m·(p_max/2)·τ (our RNS digits are bounded
by p_i/2 < 2^27, far below the paper's base B ≈ 2^32.4 — §6.1's bound
Q ≥ (15·2^{2k+2}·r·τ·sqrt(2lm))² therefore holds with extra margin), and the
worst-case post-rescale noise n·2l·m·(p_max/2)·τ·r/Q evaluates to < 2^4 at
k=1, n=1024 against the decision boundary Dr/2 = 256. Measured noise is
asserted in tests/test_bootstrap2.py and examples/scheme2_add.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as ntt_mod
from ..ops import poly as pol
from ..ops import rns as rns_mod
from .bootstrap import blind_rotate, _use_fused
from .scheme1 import LWE
from .scheme2 import Params, Scheme2Context, PrivateKey, BootstrapKey


# ---------------------------------------------------------------------------
# LWE plumbing (scheme-2 analogs of scheme-1's split/decrypt_bit)
# ---------------------------------------------------------------------------


def split_ciphertext(params: Params, a: jax.Array, b: jax.Array) -> LWE:
    """(a, b) polynomial ciphertext of n digits -> n LWEs, batched
    (the scheme-2 analog of reference src/fhe.jl:287-290)."""
    n = params.n
    length = a.shape[-1]
    i_idx = jnp.arange(n)[:, None]
    k_idx = jnp.arange(n)[None, :]
    src = (i_idx - k_idx) % length
    neg = k_idx > i_idx
    g = a[..., src]
    g = jnp.where(neg, (-g) & jnp.uint32(params.mask_r), g)
    return LWE(g, b[..., :n])


def decrypt_lwe(sk: PrivateKey, lwe: LWE) -> jax.Array:
    """Batched LWE decryption -> digit in [0, 2^{k+2}) (snap to multiples of
    Dr, reference decrypt semantics src/fhe2.jl:229-235)."""
    params = sk.params
    mask = jnp.uint32(params.mask_r)
    dot = jnp.sum(
        lwe.a.astype(jnp.uint32) * sk.key.astype(jnp.uint32), axis=-1
    )
    b1 = (lwe.b - dot) & mask
    snapped = (b1 + jnp.uint32(params.Dr // 2)) & mask
    return (snapped // jnp.uint32(params.Dr)).astype(jnp.int32)


def lwe_phase_noise(sk: PrivateKey, lwe: LWE, message: jax.Array) -> jax.Array:
    """Signed phase noise w = (b − a·s) − message·Dr, centered to
    (−r/2, r/2] — the scheme-2 noise debugger (SURVEY.md §5)."""
    params = sk.params
    mask = jnp.uint32(params.mask_r)
    dot = jnp.sum(
        lwe.a.astype(jnp.uint32) * sk.key.astype(jnp.uint32), axis=-1
    )
    b1 = (lwe.b - dot - message.astype(jnp.uint32) * jnp.uint32(params.Dr)) & mask
    w = b1.astype(jnp.int32)  # r <= 2^16 for k <= 5, so int32 is exact
    return jnp.where(w > params.r // 2, w - params.r, w)


# ---------------------------------------------------------------------------
# Test-vector construction
# ---------------------------------------------------------------------------


def make_table(params: Params, f_values) -> np.ndarray:
    """Build the (L, m) RNS residue table T for a function over combined
    digits z in [0, 2^{k+1}): T[j] = f(nearest z)·DQ with the negative-noise
    wrap band at the top Dr/2 coefficients (module docstring derivation).

    f_values: ints, length 2^{k+1} (values are taken mod 2^{k+2}; the usual
    range is [0, 2^k) digits or {0,1} flags)."""
    zmax = 2 ** (params.k + 1)
    f_values = list(f_values)
    assert len(f_values) == zmax, (len(f_values), zmax)
    m, Dr, L = params.m, params.Dr, len(params.moduli)
    DQ = params.Q // 2 ** (params.k + 2)
    half = Dr // 2
    T = np.zeros((L, m), dtype=np.uint32)
    j = np.arange(m)
    z = np.minimum((j + half) // Dr, zmax - 1)  # top band overwritten below
    fz = np.array([int(v) for v in f_values], dtype=object)[z]
    for li, p in enumerate(params.moduli):
        vals = (fz * (DQ % p)) % p
        vals[m - half :] = (-int(f_values[0]) * (DQ % p)) % p
        T[li] = vals.astype(np.uint32)
    return T


@partial(jax.jit, static_argnums=(0,))
def _tables_hat(params: Params, ctx: Scheme2Context, tables: jax.Array):
    return ntt_mod.ntt_fwd(ctx.plan_Q, tables)


def tables_hat(params: Params, ctx: Scheme2Context, f_tables) -> jax.Array:
    """Stack of F function tables -> (F, L, m) NTT-domain test vectors."""
    T = jnp.asarray(
        np.stack([make_table(params, f) for f in f_tables], axis=0)
    )
    return _tables_hat(params, ctx, T)


# ---------------------------------------------------------------------------
# The bootstrap
# ---------------------------------------------------------------------------


def _rotate_extract(
    params: Params,
    ctx: Scheme2Context,
    bkey_hat, bkey_shoup,
    ua: jax.Array,         # (M, n) mod r
    ub: jax.Array,         # (M,)
    t0: jax.Array,         # (M, L, m) per-lane NTT-domain test vectors
    flat_key,
    fused,
    prune: int = 0,
) -> LWE:
    """Rotate each lane's own test vector by its own phase, extract
    coefficient 0, switch Q->r. Returns an (M, n)/(M,) LWE batch."""
    n, m = params.n, params.m
    plan = ctx.plan_Q
    M = ua.shape[0]
    shift = (jnp.uint32(2 * m) - ub) & jnp.uint32(2 * m - 1)
    b_acc = ntt_mod.ntt_inv(plan, ntt_mod.monomial_mul_hat(plan, t0, shift))
    a_acc = jnp.zeros((M, params.num_limbs, m), dtype=jnp.uint32)
    a_acc, b_acc = blind_rotate(
        params, ctx, bkey_hat, bkey_shoup, ua, a_acc, b_acc, flat_key, fused,
        prune,
    )
    p = plan.p
    a_q = pol.extract(a_acc, 0, n, p)            # (M, L, n)
    b_q = b_acc[..., 0]                          # (M, L)
    a_r = rns_mod.rescale_exact(ctx.rns_Q, a_q, params.r, params.moduli)
    b_r = rns_mod.rescale_exact(
        ctx.rns_Q, b_q[..., None], params.r, params.moduli
    )[..., 0]
    return LWE(a_r, b_r)


@partial(jax.jit, static_argnums=(0, 6, 7, 9))
def _bootstrap_jit(
    params: Params,
    ctx: Scheme2Context,
    bkey_hat: jax.Array,
    bkey_shoup: jax.Array,
    lwe_u: LWE,
    t_hats: jax.Array,
    randomized: bool = False,
    fused: tuple[str, bool] = ("none", False),
    flat_key=None,
    prune: int = 0,
):
    B = lwe_u.a.shape[0]
    F = t_hats.shape[0]
    # gate-major lanes: input g occupies lanes [g*F, (g+1)*F), one per table
    ua = jnp.repeat(lwe_u.a, F, axis=0)          # (B*F, n)
    ub = jnp.repeat(lwe_u.b, F, axis=0)          # (B*F,)
    t0 = jnp.tile(t_hats, (B, 1, 1))             # (B*F, L, m)
    fk = flat_key if randomized else None
    out = _rotate_extract(
        params, ctx, bkey_hat, bkey_shoup, ua, ub, t0, fk, fused, prune
    )
    n = params.n
    return LWE(out.a.reshape(B, F, n), out.b.reshape(B, F))


def bootstrap(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    lwe_u: LWE,
    t_hats: jax.Array,
    flat_key=None,
    epoch: "int | None" = None,
    prune: int = 0,
) -> LWE:
    """Evaluate F functions of the phase of `lwe_u` in one batched rotation.

    lwe_u: LWE batch (B, n)/(B,) mod r whose phase is z·Dr + w.
    t_hats: (F, L, m) from `tables_hat`. Returns LWE of shape (B, F, n)/(B, F)
    — out[:, f] encrypts f-th function of z, each a fresh scheme-2
    ciphertext (noise reset by the bootstrap).

    Randomized mode folds a fresh per-call epoch into flat_key by default —
    repeated calls with the same key draw disjoint mask streams (ops/prg.py);
    pin `epoch` for reproducibility."""
    from ..ops import prg

    fused = _use_fused(params)
    if flat_key is not None:
        flat_key = prg.fold_epoch(flat_key, epoch)
    return _bootstrap_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, lwe_u, t_hats,
        flat_key is not None, fused, flat_key, prune,
    )


def _lwe_sum(params: Params, *lwes: LWE) -> LWE:
    mask = jnp.uint32(params.mask_r)
    a = lwes[0].a
    b = lwes[0].b
    for x in lwes[1:]:
        a = a + x.a
        b = b + x.b
    return LWE(a & mask, b & mask)


def add_with_carry(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    lwe1: LWE,
    lwe2: LWE,
    carry: LWE | None = None,
    flat_key=None,
    epoch: "int | None" = None,
    prune: int = 0,
) -> tuple[LWE, LWE]:
    """k-bit addition with carry (eprint 2019/521's headline operation):
    digit = (x + y + c) mod 2^k and carry-out = (x + y + c) ≥ 2^k, both as
    REFRESHED ciphertexts, from ONE blind rotation (the two output functions
    ride as adjacent batch lanes of the shared kernel)."""
    k = params.k
    zmax = 2 ** (k + 1)
    u = _lwe_sum(params, lwe1, lwe2) if carry is None else _lwe_sum(
        params, lwe1, lwe2, carry
    )
    digit_tab = [z % 2**k for z in range(zmax)]
    carry_tab = [1 if z >= 2**k else 0 for z in range(zmax)]
    th = tables_hat(params, ctx, [digit_tab, carry_tab])
    out = bootstrap(params, ctx, bkey, u, th, flat_key, epoch, prune)
    digit = LWE(out.a[:, 0], out.b[:, 0])
    cout = LWE(out.a[:, 1], out.b[:, 1])
    return digit, cout


def apply_lut(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    lwe: LWE,
    lut,
    flat_key=None,
    epoch: "int | None" = None,
    prune: int = 0,
) -> LWE:
    """Arbitrary unary digit function f: [0, 2^k) -> [0, 2^k) via one
    rotation (the functional/programmable bootstrap of eprint 2019/521 §5).
    `lut`: 2^k ints. Single inputs never reach z ≥ 2^k, so the upper half of
    the table is don't-care (set to f(z − 2^k) for definiteness)."""
    k = params.k
    lut = list(lut)
    assert len(lut) == 2**k
    th = tables_hat(params, ctx, [lut + lut])
    out = bootstrap(params, ctx, bkey, lwe, th, flat_key, epoch, prune)
    return LWE(out.a[:, 0], out.b[:, 0])


def refresh(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    lwe: LWE,
    flat_key=None,
    epoch: "int | None" = None,
) -> LWE:
    """Noise reset: identity LUT (the plain 2019/521 bootstrap)."""
    return apply_lut(
        params, ctx, bkey, lwe, list(range(2**params.k)), flat_key, epoch
    )


# ---------------------------------------------------------------------------
# k-bit multiplication (the other half of "k-bit arithmetic operations")
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 6, 7, 9))
def _bootstrap_paired_jit(
    params: Params,
    ctx: Scheme2Context,
    bkey_hat: jax.Array,
    bkey_shoup: jax.Array,
    lwe_u: LWE,            # (M, n)/(M,) — one phase per lane
    t0: jax.Array,         # (M, L, m) — one test vector per lane
    randomized: bool = False,
    fused: tuple[str, bool] = ("none", False),
    flat_key=None,
    prune: int = 0,
):
    fk = flat_key if randomized else None
    return _rotate_extract(
        params, ctx, bkey_hat, bkey_shoup, lwe_u.a, lwe_u.b, t0, fk, fused,
        prune,
    )


def _lane(out: LWE, i: int, stride: int) -> LWE:
    return LWE(out.a[i::stride], out.b[i::stride])


def mul(
    params: Params,
    ctx: Scheme2Context,
    bkey: BootstrapKey,
    lwe1: LWE,
    lwe2: LWE,
    flat_key=None,
    epoch: "int | None" = None,
    prune: int = 0,
) -> tuple[LWE, LWE]:
    """k-bit digit multiplication: x·y -> (low digit, high digit), both
    REFRESHED ciphertexts.

    Uses the quarter-squares identity x·y = ⌊(x+y)²/4⌋ − ⌊(x−y)²/4⌋ (exact
    for integers: x+y and x−y share parity), which turns the bivariate
    product into two UNARY square LUTs the functional bootstrap can evaluate:

      round 1 (one rotation, 4 lanes/gate): quarter-squares of the sum phase
              and of the offset difference phase, each split into its low and
              high output digits;
      round 2 (one rotation, 2 lanes/gate): low digit of the difference of
              quarter-squares plus its borrow bit;
      round 3 (one rotation, 1 lane/gate): high digit minus the borrow.

    All intermediate operands are bootstrap outputs (refreshed), so every
    phase entering a rotation carries O(1) noise against the Dr/2 boundary.
    The reference's scheme-2 module never reached any homomorphic op
    (src/fhe2.jl:6); eprint 2019/521 §1 names k-bit multiplication as the
    scheme's goal."""
    k = params.k
    K = 2**k
    Dr = params.Dr
    mask = jnp.uint32(params.mask_r)
    n = params.n
    B = lwe1.a.shape[0]
    from ..ops import prg

    fused = _use_fused(params)
    if flat_key is not None:
        # one epoch per public call; the three rotation rounds then split
        # the folded key into disjoint subkeys
        fk1, fk2, fk3 = jax.random.split(prg.fold_epoch(flat_key, epoch), 3)
    else:
        fk1 = fk2 = fk3 = None
    randomized = flat_key is not None

    # phases: z_sum = x + y in [0, 2K); z_diff = (x - y) + K in (0, 2K)
    u_sum = _lwe_sum(params, lwe1, lwe2)
    u_diff = LWE(
        (lwe1.a - lwe2.a) & mask,
        (lwe1.b - lwe2.b + jnp.uint32(K * Dr)) & mask,
    )
    qs_sum = [(z * z) // 4 for z in range(2 * K)]
    qs_diff = [((z - K) * (z - K)) // 4 for z in range(2 * K)]
    th4 = tables_hat(
        params, ctx,
        [
            [q % K for q in qs_sum], [q // K for q in qs_sum],
            [q % K for q in qs_diff], [q // K for q in qs_diff],
        ],
    )  # (4, L, m)

    # gate-major lanes (sum, sum, diff, diff) matching tables (0, 1, 2, 3)
    ua = jnp.stack(
        [u_sum.a, u_sum.a, u_diff.a, u_diff.a], axis=1
    ).reshape(4 * B, n)
    ub = jnp.stack([u_sum.b, u_sum.b, u_diff.b, u_diff.b], axis=1).reshape(-1)
    t0 = jnp.tile(th4, (B, 1, 1))
    out1 = _bootstrap_paired_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, LWE(ua, ub), t0,
        randomized, fused, fk1, prune,
    )
    s_lo, s_hi = _lane(out1, 0, 4), _lane(out1, 1, 4)
    d_lo, d_hi = _lane(out1, 2, 4), _lane(out1, 3, 4)

    # round 2: v = s_lo - d_lo in (-K, K); z = v + K; output v mod K and the
    # borrow [v < 0]
    u_lo = LWE(
        (s_lo.a - d_lo.a) & mask,
        (s_lo.b - d_lo.b + jnp.uint32(K * Dr)) & mask,
    )
    th2 = tables_hat(
        params, ctx,
        [
            [(z - K) % K for z in range(2 * K)],
            [1 if z < K else 0 for z in range(2 * K)],
        ],
    )
    out2 = _bootstrap_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, u_lo, th2,
        randomized, fused, fk2, prune,
    )
    lo_p = LWE(out2.a[:, 0], out2.b[:, 0])
    borrow = LWE(out2.a[:, 1], out2.b[:, 1])

    # round 3: high digit s_hi - d_hi - borrow (always in [0, K) for a true
    # product: S1 >= S2 by the quarter-squares identity)
    u_hi = LWE(
        (s_hi.a - d_hi.a - borrow.a) & mask,
        (s_hi.b - d_hi.b - borrow.b + jnp.uint32(K * Dr)) & mask,
    )
    th1 = tables_hat(params, ctx, [[(z - K) % K for z in range(2 * K)]])
    out3 = _bootstrap_jit(
        params, ctx, bkey.hat, bkey.hat_shoup, u_hi, th1,
        randomized, fused, fk3, prune,
    )
    hi_p = LWE(out3.a[:, 0], out3.b[:, 0])
    return lo_p, hi_p
