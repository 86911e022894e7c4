"""RNS (residue number system) context for the big modulus Q.

The reference represents Q as one big prime and does wide-int arithmetic via
DarkIntegers (UInt64/UInt128/MLUInt; SURVEY.md §2.3) — including the base-B
gadget decomposition `flatten` which divrems the POSITIONAL value
(reference src/utils.jl:155-189). On a TPU with 32-bit lanes that design is
hostile, so this framework makes the representation the reference's own
experimental scheme-2 already validates (src/fhe2.jl:57-60 `Q = B*Bp`,
src/rns.jl): **Q is a product of L NTT-friendly primes < 2^30**, and the
gadget decomposition is the balanced MIXED-RADIX expansion over those primes:

    x  =  d_1 + d_2*p_1 + d_3*p_1*p_2 + ...   with  d_i in (-p_i/2, p_i/2]

Digit extraction is then pure componentwise RNS arithmetic (no positional
lift): d_1 = x mod p_1 and each further digit is a Shoup multiply + subtract
chain per limb — this resolves SURVEY.md §7 "hard part #1" natively.

The gadget matrix G (reference src/fhe.jl:119-122, l=2 hardcoded) generalizes
to 2L x 2 with weights w_i = prod_{j<i} p_j, and the external-product identity
(a, b) ⊙ G == (a, b) holds exactly — tested against the reference property
(test/internals.test.jl:144-166).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..utils import primes as pr
from . import modmath as mm


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RnsContext:
    """Constants for a modulus Q = prod(p_i); all tables are device arrays.

    Array shape conventions: RNS data is (..., L, m) with the limb axis at -2;
    all per-limb constants here are (L, 1) and per-(digit, limb) tables are
    (L', L, 1) so they broadcast cleanly.
    """

    p: jax.Array             # (L, 1) uint32
    mu: jax.Array            # (L, 1) floor(2^32/p)
    # mixed-radix extraction constants: for digit i (1-indexed i >= 2) the
    # chain subtracts d_j and multiplies by inv(p_j) mod p_i for j < i.
    # stored dense: inv_pj_mod_pi[i, j] with shoup companions (zeros unused).
    inv_pj_val: jax.Array    # (L, L) uint32: inv(p_j) mod p_i for j < i
    inv_pj_shoup: jax.Array  # (L, L)
    # gadget weights w_i = prod_{j<i} p_j, embedded per limb, with companions
    w_val: jax.Array         # (L, L, 1): w_val[i, k] = w_i mod p_k
    w_shoup: jax.Array       # (L, L, 1)
    # balanced-digit offsets s_i = (p_i - 1) / 2
    s_digit: jax.Array       # (L, 1) uint32: s_i (plain value, < p_i)
    s_mod: jax.Array         # (L, L, 1): s_i mod p_k
    offset: jax.Array        # (L, 1): sum_i w_i * s_i mod p_k (per limb k)
    # static: True when max(p) < 2*min(p) (always, for Params-derived prime
    # sets — one narrow search window), letting cross-limb re-reductions of
    # canonical values use a single conditional subtract instead of Barrett.
    close_primes: bool = dataclasses.field(
        default=False, metadata=dict(static=True)
    )


def build_context(moduli: tuple[int, ...]) -> "RnsContextHost":
    return RnsContextHost(tuple(int(p) for p in moduli))


class RnsContextHost:
    """Host-side companion holding Python-int constants; builds device ctx."""

    def __init__(self, moduli: tuple[int, ...]):
        self.moduli = moduli
        self.L = len(moduli)
        self.Q = 1
        for p in moduli:
            self.Q *= p
        # mixed-radix weights
        self.weights = []
        w = 1
        for p in moduli:
            self.weights.append(w)
            w *= p
        self.s = [(p - 1) // 2 for p in moduli]
        self.offset_int = sum(wi * si for wi, si in zip(self.weights, self.s)) % self.Q

    def to_rns(self, x) -> np.ndarray:
        """Python int / array of ints -> (L, ...) uint32 residues."""
        arr = np.asarray(x, dtype=object)
        out = np.empty((self.L,) + arr.shape, dtype=np.uint32)
        for i, p in enumerate(self.moduli):
            out[i] = np.vectorize(lambda v: int(v) % p, otypes=[np.uint32])(arr)
        return out

    def from_rns(self, residues: np.ndarray):
        """(L, ...) residues -> object array of Python ints in [0, Q) (CRT).

        Mirrors the reference's convert-out (src/rns.jl:32-40) generalized to
        L moduli.
        """
        res = np.zeros(residues.shape[1:], dtype=object)
        for i, p in enumerate(self.moduli):
            qi = self.Q // p
            ci = pr.inv_mod(qi, p)
            res = res + residues[i].astype(object) * (qi * ci)
        return np.vectorize(lambda v: int(v) % self.Q, otypes=[object])(res)

    def device_context(self) -> RnsContext:
        L = len(self.moduli)
        mods = self.moduli
        p = np.array(mods, dtype=np.uint32).reshape(L, 1)
        mu = np.array([mm.barrett_mu(q) for q in mods], dtype=np.uint32).reshape(L, 1)
        inv_pj_val = np.zeros((L, L), dtype=np.uint32)
        inv_pj_shoup = np.zeros((L, L), dtype=np.uint32)
        for i in range(L):
            for j in range(i):
                v = pr.inv_mod(mods[j], mods[i])
                inv_pj_val[i, j] = v
                inv_pj_shoup[i, j] = mm.shoup_const(v, mods[i])
        w_val = np.zeros((L, L, 1), dtype=np.uint32)
        w_shoup = np.zeros((L, L, 1), dtype=np.uint32)
        s_mod = np.zeros((L, L, 1), dtype=np.uint32)
        for i in range(L):
            for k in range(L):
                wv = self.weights[i] % mods[k]
                w_val[i, k, 0] = wv
                w_shoup[i, k, 0] = mm.shoup_const(wv, mods[k])
                s_mod[i, k, 0] = self.s[i] % mods[k]
        s_digit = np.array(self.s, dtype=np.uint32).reshape(L, 1)
        offset = np.array(
            [self.offset_int % q for q in mods], dtype=np.uint32
        ).reshape(L, 1)
        return RnsContext(
            close_primes=pr.close_primes(mods),
            p=jnp.asarray(p),
            mu=jnp.asarray(mu),
            inv_pj_val=jnp.asarray(inv_pj_val),
            inv_pj_shoup=jnp.asarray(inv_pj_shoup),
            w_val=jnp.asarray(w_val),
            w_shoup=jnp.asarray(w_shoup),
            s_digit=jnp.asarray(s_digit),
            s_mod=jnp.asarray(s_mod),
            offset=jnp.asarray(offset),
        )


# ---------------------------------------------------------------------------
# Device-side ops
# ---------------------------------------------------------------------------


def add(ctx: RnsContext, a, b):
    return mm.addmod(a, b, ctx.p)


def sub(ctx: RnsContext, a, b):
    return mm.submod(a, b, ctx.p)


def neg(ctx: RnsContext, a):
    return mm.negmod(a, ctx.p)


def flatten(ctx: RnsContext, x: jax.Array, prune: int = 0) -> jax.Array:
    """Balanced mixed-radix gadget decomposition (deterministic `flatten`).

    x: (..., L, m) residues of values in [0, Q).
    Returns (..., L_digits, L, m): digit i re-embedded across all limbs, where
    digit values are the balanced digits d_i - s_i represented mod each p_k.
    Satisfies sum_i w_i * digit_i == x (mod Q) exactly — the reference's
    reconstruction property (test/internals.test.jl:50-112) with digit bound
    |d_i| <= (p_i-1)/2 (analog of the (-B/2, B/2] range, src/utils.jl:150-154).

    prune > 0 drops the `prune` LOWEST digits (approximate gadget
    decomposition, the TFHE-style digit-pruning optimization): only digits
    i in [prune, L) are returned, satisfying
    sum_{i>=prune} w_i * digit_i == x - eps (mod Q) with
    |eps| <= sum_{i<prune} w_i * s_i — see models/params.prune_error_bound
    for the post-rescale noise this admits (docs/theory.md)."""
    L = ctx.p.shape[0]
    # shift by the offset so unsigned mixed-radix digits become balanced
    y = mm.addmod(x, ctx.offset, ctx.p)
    # mixed-radix extraction: digits as plain uint32 (value of d_i in [0, p_i))
    # — the lowest digits are still EXTRACTED under pruning (the chain peels
    # them to reach the kept digits); only their embedding is skipped.
    digits = []
    for i in range(L):
        t = y[..., i, :]
        pi = ctx.p[i]  # (1,) broadcast
        for j in range(i):
            if ctx.close_primes:  # canonical mod p_j < 2*p_i: one cond-sub
                dj_mod_pi = jnp.where(digits[j] >= pi, digits[j] - pi, digits[j])
            else:
                dj_mod_pi = mm.mod_u32(digits[j], pi, ctx.mu[i])
            t = mm.submod(t, dj_mod_pi, pi)
            t = mm.shoup_mul(t, ctx.inv_pj_val[i, j], ctx.inv_pj_shoup[i, j], pi)
        digits.append(t)
    # embed each kept digit into all limbs, subtract the balancing offset s_i
    out = []
    for i in range(prune, L):
        d = digits[i][..., None, :]  # (..., 1, m), canonical mod p_i
        if ctx.close_primes:
            e = jnp.where(d >= ctx.p, d - ctx.p, d)  # (..., L, m)
        else:
            e = mm.mod_u32(d, ctx.p, ctx.mu)
        e = mm.submod(e, ctx.s_mod[i], ctx.p)
        out.append(e)
    return jnp.stack(out, axis=-3)  # (..., L_digits - prune, L, m)


def mask_window_bits(p: int) -> int:
    """k such that the randomized-flatten mask window is [-2^k, 2^k):
    the smallest power of two with 2^k >= 3*s (s = (p-1)/2, the balanced
    digit bound), i.e. AT LEAST the reference's [-3s, 3s] smudging span
    (src/utils.jl:198-241). EXACTLY uniform (one masked draw, no modular
    reduction). Resulting digit bound: |digit| <= 2^k + s < 3.5*p — within
    (-4p, 4p), the analog of the reference's (-2B, 2B] with a 2x-wider
    window relative to its base (our per-digit noise contribution is still
    ~2^13x smaller than the reference's, whose base B ~ 35 r^2 n >> p)."""
    s = (p - 1) // 2
    return (3 * s - 1).bit_length()


def mask_words(seed2, c0, step, op: int, L: int) -> list[jax.Array]:
    """The L uint32 flatten-mask words for counter coordinates (c0; step,
    op) under key seed2 = (seed_lo, seed_hi) — the ONE implementation of the
    documented mask stream (ops/prg.py module docstring), shared verbatim by
    the jnp path (`flatten_random`) and the Pallas kernels
    (ops/fused._flatten_rand_k), which is what makes fused == jnp
    bit-for-bit in randomized mode. Each Threefry-2x32 block yields two
    words = masks for digits (2*pair, 2*pair + 1)."""
    from . import prg

    num_pairs = (L + 1) // 2
    words: list[jax.Array] = []
    for pair in range(num_pairs):
        c1 = prg.mask_stream_c1(step, op, pair, num_pairs)
        y0, y1 = prg.threefry2x32(seed2[0], seed2[1], c0, c1)
        words += [y0, y1]
    return words[:L]


def flatten_random(
    ctx: RnsContext,
    x: jax.Array,
    moduli: tuple[int, ...],
    seed2,
    step,
    op: int = 0,
    gate_offset=0,
    c0=None,
    prune: int = 0,
) -> jax.Array:
    """Randomized gadget decomposition (reference src/utils.jl:198-241).

    Masks each digit with an exactly-uniform value in [-2^k, 2^k)
    (2^k >= 3*s_i, see mask_window_bits), deterministically flattens the
    unmasked remainder, and adds the masks back — digit i stays within
    (-4*p_i, 4*p_i). `moduli` is the STATIC tuple from Params so the windows
    are compile-time constants.

    Randomness is the documented Threefry-2x32 counter stream (ops/prg.py):
    seed2 = (seed_lo, seed_hi) uint32 words, `step`/`op` name the flatten
    within the bootstrap, and the per-element counter is
    gate * m + coeff with gate = row-major index over the leading batch
    axes plus `gate_offset`. The fused kernels draw the SAME stream, so the
    two randomized paths are bit-identical (tests/test_fused.py).
    """
    L = ctx.p.shape[0]
    m = x.shape[-1]
    batch = x.shape[:-2]
    if c0 is None:
        ng = 1
        for b in batch:
            ng *= int(b)
        g = jnp.arange(ng, dtype=jnp.uint32).reshape(batch + (1,)) + jnp.uint32(
            gate_offset
        )
        c0 = g * jnp.uint32(m) + jnp.arange(m, dtype=jnp.uint32)
    # c0 override: callers whose local coefficient layout is not the flat
    # 0..m-1 order (the tp-sharded rotation holds a column slice of the
    # coefficient axis) pass the global (gate*m + coeff) counters directly,
    # so their mask stream matches the single-device one bit-for-bit.
    words = mask_words(seed2, c0, step, op, L)
    masks = []
    rand_x = x
    # pruned digits are never output, so they need no privacy mask: only
    # digits i >= prune are masked (word i still addresses digit i, keeping
    # the documented stream coordinates identical across prune settings)
    for i in range(prune, L):
        k_bits = mask_window_bits(moduli[i])
        v = words[i] & jnp.uint32((1 << (k_bits + 1)) - 1)
        # uniform in [0, 2^{k+1}); value - 2^k is the signed mask.
        # embed (v - 2^k) into all limbs
        u = v[..., None, :]
        e = mm.mod_u32(u, ctx.p, ctx.mu)
        off_mod = np.array(
            [(1 << k_bits) % q for q in moduli], dtype=np.uint32
        ).reshape(L, 1)
        e = mm.submod(e, jnp.asarray(off_mod), ctx.p)  # (..., L, m)
        masks.append(e)
        # rand_x -= mask * w_i
        contrib = mm.shoup_mul(e, ctx.w_val[i], ctx.w_shoup[i], ctx.p)
        rand_x = mm.submod(rand_x, contrib, ctx.p)
    y = flatten(ctx, rand_x, prune)  # (..., L - prune, L, m)
    return mm.addmod(y, jnp.stack(masks, axis=-3), ctx.p)


def seed_words(key: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Derive the two uint32 Threefry key words from a JAX PRNG key — the
    single definition both dispatch paths use (models/bootstrap.blind_rotate
    and the kernel SMEM seed)."""
    sw = jax.random.bits(key, (1, 2), jnp.uint32)
    return sw[0, 0], sw[0, 1]


def mixed_radix_digits(ctx: RnsContext, x: jax.Array) -> list[jax.Array]:
    """Unbalanced mixed-radix digits of x (residues (..., L, m), values in
    [0, Q)): returns L arrays (..., m) with 0 <= d_i < p_i and
    x == sum_i d_i * w_i exactly (not just mod Q). Same extraction chain as
    `flatten` without the balancing offset."""
    L = ctx.p.shape[0]
    digits = []
    for i in range(L):
        t = x[..., i, :]
        pi = ctx.p[i]
        for j in range(i):
            dj_mod_pi = mm.mod_u32(digits[j], pi, ctx.mu[i])
            t = mm.submod(t, dj_mod_pi, pi)
            t = mm.shoup_mul(t, ctx.inv_pj_val[i, j], ctx.inv_pj_shoup[i, j], pi)
        digits.append(t)
    return digits


def _limbs_of_int(v: int, nl: int) -> list[np.uint32]:
    return [np.uint32((v >> (32 * j)) & 0xFFFFFFFF) for j in range(nl)]


def _mll_add(a: list, b: list) -> list:
    """Multi-limb add (little-endian u32 limb lists), wrapping mod 2^(32*NL)."""
    out = []
    carry = None
    for x, y in zip(a, b):
        s = x + y
        c1 = (s < x).astype(jnp.uint32)
        if carry is not None:
            s2 = s + carry
            c1 = c1 | (s2 < s).astype(jnp.uint32)
            s = s2
        out.append(s)
        carry = c1
    return out


def _mll_neg(a: list) -> list:
    """Two's-complement negation of a limb list (so add(x, neg(y)) == x - y
    mod 2^(32*NL))."""
    out = []
    carry = None  # start with +1 for two's complement
    for x in a:
        v = ~x
        if carry is None:
            s = v + jnp.uint32(1)
            carry = (s == 0).astype(jnp.uint32)
        else:
            s = v + carry
            carry = ((carry == 1) & (s == 0)).astype(jnp.uint32)
        out.append(s)
    return out


def _mll_mul_const(d: jax.Array, k: int, nl: int) -> list:
    """d (u32 array) times the static Python int k, as an NL-limb list."""
    kl = _limbs_of_int(int(k), nl)
    zero = jnp.zeros_like(d)
    acc = [zero] * nl
    for j in range(nl):
        if int(kl[j]) == 0:
            continue
        hi, lo = mm.mulhilo(d, kl[j])
        part = [zero] * j + [lo] + ([hi] if j + 1 < nl else []) + [zero] * max(
            0, nl - j - 2
        )
        acc = _mll_add(acc, part)
    return acc


def _mll_ge_const(a: list, t: int) -> jax.Array:
    """a >= t (static int), lexicographic from the most-significant limb."""
    tl = _limbs_of_int(int(t), len(a))
    gt = None
    eq = None
    for x, tv in zip(reversed(a), reversed(tl)):
        x_gt = x > tv
        x_eq = x == tv
        if gt is None:
            gt, eq = x_gt, x_eq
        else:
            gt = gt | (eq & x_gt)
            eq = eq & x_eq
    return gt | eq


def rescale_exact(
    ctx: RnsContext,
    x: jax.Array,
    new_max: int,
    moduli: tuple[int, ...],
    round_result: bool = True,
) -> jax.Array:
    """EXACT round/floor(x * new_max / Q) mod new_max for power-of-two
    new_max and static moduli (reference `rescale`, src/utils.jl:78-92, and
    the Q->r modulus switch src/utils.jl:120-127).

    Algorithm: extract the exact mixed-radix digits d_i of x (so
    x = sum d_i w_i as INTEGERS), form a float32 estimate of
    v = (A*x + B) / C  (round: A=2*new_max, B=Q, C=2Q; floor: A=new_max, B=0,
    C=Q — round(x*new_max/Q) == floor((2*x*new_max + Q) / 2Q); Q odd means no
    ties), then correct the estimate with an EXACT multi-limb evaluation of
    D = A*x + B - (q_est - K)*C: the true quotient q satisfies
    (q - q_est + K)*C <= D < (q - q_est + K + 1)*C, so counting how many
    static multiples of C fit under D recovers q from q_est exactly for any
    offset |q - q_est| <= K. K is derived statically from the float32 error
    budget below (K = 1 for every Params through n = 8192; 2 at n = 16384,
    where A = 2r = 2^19 outgrows the one-step budget).
    """
    assert new_max & (new_max - 1) == 0, "new_max must be a power of two"
    moduli = tuple(int(p) for p in moduli)
    Q = 1
    weights = []
    for p in moduli:
        weights.append(Q)
        Q *= p
    if round_result:
        A, B, C = 2 * new_max, Q, 2 * Q
    else:
        A, B, C = new_max, 0, Q
    # Float32 error budget: each of the L digit terms d_i*(A*w_i/C) carries
    # <= 3 single-op roundings on a value of magnitude <= A (the digit's own
    # float32 representation, the constant's rounding, the product), plus
    # L accumulation roundings — conservatively |est - v| < 3(L+2)*A*2^-23.
    # q_est = floor(est) then sits within ceil(e) of the true quotient, and
    # the exact ladder absorbs any offset <= K, so pick K = ceil(e). The cap
    # only guards against absurd new_max where float32 stops making sense.
    K = max(1, -(-(3 * (len(moduli) + 2) * A) // (1 << 23)))
    assert K <= 4, (
        f"rescale_exact: new_max={new_max} exceeds the float32 estimate "
        f"error budget for L={len(moduli)} limbs (correction ladder would "
        f"need K={K} > 4 steps; use a wider estimate)"
    )
    # limb count: the largest intermediate is A*(Q-1) + B + K*C
    nl = (A * (Q - 1) + B + (K + 1) * C).bit_length() // 32 + 1

    digits = mixed_radix_digits(ctx, x)  # L arrays (..., m), d_i < p_i

    # float32 estimate of v = sum_i d_i * (A*w_i/C) + B/C
    est = None
    for i, d in enumerate(digits):
        f = np.float32(A * weights[i] / C)
        term = d.astype(jnp.float32) * f
        est = term if est is None else est + term
    if B:
        est = est + np.float32(B / C)
    # clamp: in floor mode est may dip epsilon below 0 when v == 0; the
    # uint32 cast must never see a negative (clamped 0 is still in {q, q+1})
    est = jnp.maximum(est, jnp.float32(0.0))
    q_est = jnp.floor(est).astype(jnp.uint32)  # within K of q, >= 0

    # exact D = sum_i d_i*(A*w_i) + (B + K*C) - q_est*C (all limbs wrap-exact)
    acc = [jnp.broadcast_to(v, q_est.shape).astype(jnp.uint32)
           for v in _limbs_of_int(B + K * C, nl)]
    for i, d in enumerate(digits):
        acc = _mll_add(acc, _mll_mul_const(d, A * weights[i], nl))
    acc = _mll_add(acc, _mll_neg(_mll_mul_const(q_est, C, nl)))
    # q = q_est - K + #{i in 1..2K : D >= i*C}  (uint32 wrap is exact: the
    # true quotient is a nonnegative uint32)
    q = q_est - jnp.uint32(K)
    for i in range(1, 2 * K + 1):
        q = q + _mll_ge_const(acc, i * C).astype(jnp.uint32)
    return q & jnp.uint32(new_max - 1)


def rescale_wide(
    new_max: int, x: jax.Array, old_max: int, round_result: bool
) -> jax.Array:
    """EXACT floor/round(x * new_max / old_max) for ANY old_max < 2^31 and
    power-of-two new_max — the single-modulus case of `rescale_exact` (no
    mixed-radix chain needed: x IS the digit). Extends mm.rescale beyond its
    divisor < 2^28 range (its int32 fixup bound), enabling Params(n) for
    n up to 4096 where q ~ 2^28..2^30 (reference handles these via the
    UInt128 `rlwe_type` knob, src/fhe.jl:71-81).

    Matches the reference semantics (src/utils.jl:78-92) including the
    round-to-new_max -> 0 wrap (handled by the final mask) and exact ties:
    round(v) = floor((2*x*new_max + old_max) / (2*old_max)) reproduces the
    reference's floor(x*new_max/old_max + 1/2) for any parity of old_max.
    """
    assert new_max & (new_max - 1) == 0, "new_max must be a power of two"
    old_max = int(old_max)
    if round_result:
        A, B, C = 2 * new_max, old_max, 2 * old_max
    else:
        A, B, C = new_max, 0, old_max
    # float32 error budget (see rescale_exact): x*A/C + B/C is two rounded
    # float ops on a value <= A plus x's own 2^-24 representation error, so
    # |est - v| < 3*A*2^-23; the K-step exact ladder absorbs offsets <= K.
    K = max(1, -(-(3 * A) // (1 << 23)))
    assert K <= 4, (
        f"rescale_wide: new_max={new_max} exceeds the float32 estimate "
        f"error budget (correction ladder would need K={K} > 4 steps)"
    )
    nl = (A * (old_max - 1) + B + (K + 1) * C).bit_length() // 32 + 1
    est = x.astype(jnp.float32) * np.float32(A / C) + np.float32(B / C)
    est = jnp.maximum(est, jnp.float32(0.0))
    q_est = jnp.floor(est).astype(jnp.uint32)
    acc = [jnp.broadcast_to(v, q_est.shape).astype(jnp.uint32)
           for v in _limbs_of_int(B + K * C, nl)]
    acc = _mll_add(acc, _mll_mul_const(x, A, nl))
    acc = _mll_add(acc, _mll_neg(_mll_mul_const(q_est, C, nl)))
    q = q_est - jnp.uint32(K)
    for i in range(1, 2 * K + 1):
        q = q + _mll_ge_const(acc, i * C).astype(jnp.uint32)
    return q & jnp.uint32(new_max - 1)
