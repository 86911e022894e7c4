"""Scheme 1 (Gao eprint 2018/637): keys, ciphertext types, encrypt/decrypt.

TPU-native rebuild of reference src/fhe.jl:102-507. Structure:

 - `SchemeContext` — pytree of device constants (NTT plans for Q and q, RNS
   context, initial test-vector polynomial) derived once from `Params`.
 - Key objects hold device arrays + the static `Params`; the jitted kernels
   take raw arrays so everything composes under jit/shard_map.
 - Ciphertext containers mirror the reference's type set: PackedCiphertext,
   Ciphertext, EncryptedBit (batched), PrivateEncryptedCiphertext,
   PublicEncryptedCiphertext (src/fhe.jl:252-383).

All mod-r arithmetic uses the fact that r = 16n is a power of two: plain
uint32 + masking, with products against the {0,1} key done as exact int32
negacyclic matmuls (rides the MXU) — no NTT needed at modulus r, unlike the
reference which requires an NTT-friendly ring everywhere.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import fused as fused_mod
from ..ops import modmath as mm
from ..ops import ntt as ntt_mod
from ..ops import poly as pol
from ..ops import rns as rns_mod
from ..utils import prng
from .params import Params


# ---------------------------------------------------------------------------
# Context
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SchemeContext:
    plan_Q: ntt_mod.NttPlan       # length-m NTT over the RNS moduli
    plan_q: ntt_mod.NttPlan       # length-n NTT over q's prime factor(s)
    rns: rns_mod.RnsContext       # RNS constants (rescale target r)
    rns_q: rns_mod.RnsContext     # RNS constants for q (Lq = 1 when prime)
    tpoly_dq: jax.Array           # (L, m): t(x) * DQ~ residues (initial poly)
    tpoly_dq_hat: jax.Array       # (L, m): NTT of the above
    dq_tilde: jax.Array           # (L, 1): DQ~ mod p_i
    fused: fused_mod.FusedTables  # tiled-NTT tables for the Pallas hot path


def make_context(params: Params) -> SchemeContext:
    from ..utils import progress

    progress.log(
        f"make_context n={params.n}: building NTT/RNS tables "
        f"(m={params.m}, L={params.num_limbs})"
    )
    plan_Q = ntt_mod.build_plan(params.moduli, params.m)
    plan_q = ntt_mod.build_plan(params.q_factors, params.n)
    host = rns_mod.build_context(params.moduli)
    rctx = host.device_context()
    rctx_q = rns_mod.build_context(params.q_factors).device_context()
    # initial poly t(x) = sum_{j=-(Dr-1)}^{Dr-1} x^j (reference
    # src/fhe.jl:535-548), scaled by DQ~ = Q // 8
    Q = params.Q
    DQt = Q // 8
    L = params.num_limbs
    m = params.m
    coeffs = np.zeros((L, m), dtype=np.uint32)
    for li, p in enumerate(params.moduli):
        pos = DQt % p
        neg = (-DQt) % p
        coeffs[li, 0 : params.Dr] = pos
        coeffs[li, m - params.Dr + 1 : m] = neg
    dqt = np.array([DQt % p for p in params.moduli], dtype=np.uint32).reshape(L, 1)
    tpoly = jnp.asarray(coeffs)
    # jit the one-off transform: eagerly it dispatches ~20 ops per stage with
    # a fresh mini-compile each (minutes at m=4096); jitted it is one compile
    tpoly_hat = jax.jit(ntt_mod.ntt_fwd)(plan_Q, tpoly)
    return SchemeContext(
        plan_Q=plan_Q,
        plan_q=plan_q,
        rns=rctx,
        rns_q=rctx_q,
        tpoly_dq=tpoly,
        tpoly_dq_hat=tpoly_hat,
        dq_tilde=jnp.asarray(dqt),
        fused=fused_mod.build_fused(plan_Q),
    )


# ---------------------------------------------------------------------------
# Ciphertext containers (reference src/fhe.jl:206-301, 375-383)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RLWE:
    """RLWE pair over Z_r: a, b are (..., len) uint32."""

    a: jax.Array
    b: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LWE:
    """(Batched) LWE over Z_r: a (..., n), b (...)."""

    a: jax.Array
    b: jax.Array

    def __add__(self, other):
        return LWE(self.a + other.a, self.b + other.b)  # callers mask mod r

    def __sub__(self, other):
        return LWE(self.a - other.a, self.b - other.b)


@dataclasses.dataclass
class PackedCiphertext:
    """n bits in R_{n,r}^2 from initial encryption (src/fhe.jl:252-255)."""

    params: Params
    rlwe: RLWE


@dataclasses.dataclass
class Ciphertext:
    """n bits in R_{m,r}^2 from packing (src/fhe.jl:263-266)."""

    params: Params
    rlwe: RLWE


@dataclasses.dataclass
class EncryptedBit:
    """One or a batch of single-bit LWE ciphertexts (src/fhe.jl:272-274)."""

    lwe: LWE


@dataclasses.dataclass
class PrivateEncryptedCiphertext:
    """Space-optimal private encryption: 6 bits/bit (src/fhe.jl:293-301)."""

    params: Params
    u: jax.Array  # (n,) uint8 bits
    v: jax.Array  # (5, n) uint8 bits


@dataclasses.dataclass
class PublicEncryptedCiphertext:
    """Space-optimal public encryption: (10+log2 n) bits/bit
    (src/fhe.jl:375-383)."""

    params: Params
    a_bits: jax.Array  # (t+1, n)
    b_bits: jax.Array  # (6, n)


# ---------------------------------------------------------------------------
# Keys
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PrivateKey:
    """s in {0,1}^n as a ring element of Z_r (reference src/fhe.jl:130-138)."""

    params: Params
    key: jax.Array  # (n,) uint32 bits

    @classmethod
    def create(cls, params: Params, key: jax.Array) -> "PrivateKey":
        bits = jax.random.bernoulli(key, 0.5, (params.n,)).astype(jnp.uint32)
        return cls(params, bits)


@dataclasses.dataclass
class PublicKey:
    """(k0, k1 = k0 s + e) over Z_q (reference src/fhe.jl:146-168).

    k0/k1 are (n,) residues when q is a single prime (n <= 4096); in the
    RNS-q regime (n = 8192, params.q_moduli set) they are (Lq, n) residue
    stacks over q's prime factors."""

    params: Params
    k0: jax.Array  # (n,) uint32 mod q, or (Lq, n) RNS residues
    k1: jax.Array

    @classmethod
    def create(cls, ctx: SchemeContext, sk: PrivateKey, key: jax.Array) -> "PublicKey":
        k0, k1 = _pubkey_kernel(sk.params, ctx, sk.key, key)
        return cls(sk.params, k0, k1)


@partial(jax.jit, static_argnums=(0,))
def _pubkey_kernel(params: Params, ctx: SchemeContext, s_bits, key: jax.Array):
    k_u, k_e = jax.random.split(key)
    # e_max: largest integer strictly less than Dq / (41 n)
    dq, rr = divmod(params.Dq, 41 * params.n)
    e_max = dq - (1 if rr == 0 else 0)
    if len(params.q_factors) == 1:
        q = params.q
        k0 = jax.random.randint(
            k_u, (params.n,), 0, q, dtype=jnp.int32
        ).astype(jnp.uint32)
        e = jax.random.randint(
            k_e, (params.n,), 0, 2 * e_max + 1, dtype=jnp.int32
        ) - e_max
        e_mod = mm.embed_signed(
            e, jnp.uint32(q), ctx.plan_q.mu[0, 0], ctx.plan_q.r_mod_p[0, 0]
        )
        s_q = s_bits[None, :]  # (1, n): limb axis of size 1 for plan_q
        k1 = ntt_mod.polymul(ctx.plan_q, k0[None, :], s_q)[0]
        k1 = mm.addmod(k1, e_mod, jnp.uint32(q))
        return k0, k1
    # RNS q (n = 8192): k0 uniform per limb, same algebra per residue
    # (the scheme-2 public key's structure, models/scheme2.py)
    Lq = len(params.q_factors)
    n = params.n
    p_vec = ctx.plan_q.p
    keys_u = jax.random.split(k_u, Lq)
    k0 = jnp.stack(
        [
            jax.random.randint(keys_u[i], (n,), 0, p, dtype=jnp.int32).astype(
                jnp.uint32
            )
            for i, p in enumerate(params.q_factors)
        ]
    )
    e = jax.random.randint(
        k_e, (1, n), 0, 2 * e_max + 1, dtype=jnp.int32
    ) - e_max
    e_mod = mm.embed_signed(e, p_vec, ctx.plan_q.mu, ctx.plan_q.r_mod_p)
    s_q = jnp.broadcast_to(s_bits, (Lq, n)).astype(jnp.uint32)
    k1 = ntt_mod.polymul(ctx.plan_q, k0, s_q)
    k1 = mm.addmod(k1, e_mod, p_vec)
    return k0, k1


@dataclasses.dataclass
class BootstrapKey:
    """NTT-domain GSW encryptions of the key bits (reference
    src/fhe.jl:176-203), stored with Shoup companions for the hot path.

    hat / hat_shoup: (n, 2l, 2, L, m) uint32. The a-column (hat[:, :, 0])
    is the NTT of uniform residues generated from `seed` — a seeded key
    (serialize.bootstrap_key_to_wire_seeded) ships only the seed plus the
    b-column and regenerates the rest on load (~4x smaller on the wire).
    """

    params: Params
    hat: jax.Array
    hat_shoup: jax.Array
    seed: np.ndarray | None = None  # raw PRNG key data for the a-column

    @classmethod
    def create(
        cls, ctx: SchemeContext, sk: PrivateKey, key: jax.Array
    ) -> "BootstrapKey":
        from ..utils import progress

        params = sk.params
        k_a, k_e = jax.random.split(key)
        mb = params.n * 2 * params.num_digits * 2 * params.num_limbs \
            * params.m * 4 // 2**20
        with progress.stage(
            f"BootstrapKey.create n={params.n} (device GSW generation, "
            f"{mb} MiB hat)"
        ):
            hat = _bkey_kernel(params, ctx, sk.key, k_a, k_e)
            jax.block_until_ready(hat)
        with progress.stage("BootstrapKey.create shoup companions (host)"):
            shoup = _shoup_companion(np.asarray(hat), params.moduli)
        return cls(
            params, hat, jnp.asarray(shoup),
            seed=np.asarray(jax.random.key_data(k_a)),
        )

    @classmethod
    def from_seeded(
        cls,
        params: Params,
        ctx: SchemeContext,
        seed: np.ndarray,
        b_hat: jax.Array,
    ) -> "BootstrapKey":
        """Rebuild the full key from (seed, b-column): regenerate the
        uniform a-polynomials from the seed, NTT them, recompute Shoup."""
        n, m, L = params.n, params.m, params.num_limbs
        rows = 2 * params.num_digits
        k_a = jax.random.wrap_key_data(jnp.asarray(seed, dtype=jnp.uint32))
        a = _uniform_residues(k_a, (n, rows, L, m), params.moduli)
        a_hat = ntt_mod.ntt_fwd(ctx.plan_Q, a)
        hat = jnp.stack([a_hat, jnp.asarray(b_hat)], axis=2)
        shoup = _shoup_companion(np.asarray(hat), params.moduli)
        return cls(params, hat, jnp.asarray(shoup), seed=np.asarray(seed))


def _shoup_companion(hat_np: np.ndarray, moduli) -> np.ndarray:
    mods = np.array(moduli, dtype=np.uint64).reshape(1, 1, 1, len(moduli), 1)
    return ((hat_np.astype(np.uint64) << np.uint64(32)) // mods).astype(
        np.uint32
    )


@partial(jax.jit, static_argnums=(0,))
def _bkey_kernel(params: Params, ctx: SchemeContext, s_bits, k_a, k_e):
    """Device computation of the bootstrap key (reference src/fhe.jl:181-201),
    one fused jit program.

    The gadget terms live entirely on the b-column: row j < l is
    (a, a·s + e − s_i·w_j·s(x)) — algebraically the same GSW row as the
    reference's (a' + s_i·w_j, a'·s + e) layout (both satisfy
    b − a·s = e − s_i·w_j·s), but with a UNIFORM a-column that a seeded
    wire format can regenerate from the PRNG seed alone."""
    n, m, L = params.n, params.m, params.num_limbs
    l = params.num_digits
    rows = 2 * l
    plan = ctx.plan_Q
    p_vec = plan.p  # (L, 1)

    # uniform over [0, Q): independent uniform residues per limb
    a = _uniform_residues(k_a, (n, rows, L, m), params.moduli)
    # noise |e| <= n, identical integer across limbs (same residue of the
    # same signed value)
    e = jax.random.randint(
        k_e, (n, rows, 1, m), -params.n, params.n + 1, dtype=jnp.int32
    )
    e_mod = mm.embed_signed(e, p_vec, plan.mu, plan.r_mod_p)

    s_ext = pol.resize(s_bits, m)  # (m,) bits
    s_rns = jnp.broadcast_to(s_ext, (L, m)).astype(jnp.uint32)
    s_hat = ntt_mod.ntt_fwd(plan, s_rns)
    a_hat = ntt_mod.ntt_fwd(plan, a)
    b_hat = ntt_mod.pointwise_mul(plan, a_hat, s_hat)
    b = ntt_mod.ntt_inv(plan, b_hat)
    b = mm.addmod(b, e_mod, p_vec)

    # gadget terms, b-column only:
    #   rows :l  — subtract s_i·w_j·s(x)  (s, w, s_i all < p: plain product)
    #   rows l:  — add s_i·w_j at coefficient 0
    wv = ctx.rns.w_val[..., 0]  # (l, L)
    add0 = (s_bits[:, None, None] * wv[None]).astype(jnp.uint32)  # (n, l, L)
    term = add0[:, :, :, None] * s_rns[None, None]  # (n, l, L, m), < 2^30
    b = b.at[:, :l].set(mm.submod(b[:, :l], term, p_vec))
    delta = jnp.zeros((n, l, L, m), dtype=jnp.uint32)
    delta = delta.at[:, :, :, 0].set(add0)
    b = b.at[:, l:].set(mm.addmod(b[:, l:], delta, p_vec))

    C = jnp.stack([a, b], axis=2)  # (n, rows, 2, L, m) coefficient domain
    return ntt_mod.ntt_fwd(plan, C)


def _uniform_residues(key, shape, moduli):
    """Independent uniform residues mod each p_i — exactly uniform over
    [0, Q) by CRT (the TPU-native version of reference src/fhe.jl:187-193
    `rand(range_Q)`)."""
    L = len(moduli)
    assert shape[-2] == L
    keys = jax.random.split(key, L)
    cols = []
    for i, p in enumerate(moduli):
        cols.append(
            jax.random.randint(
                keys[i], shape[:-2] + (shape[-1],), 0, p, dtype=jnp.int32
            ).astype(jnp.uint32)
        )
    return jnp.stack(cols, axis=-2)


# ---------------------------------------------------------------------------
# Encryption / decryption (reference src/fhe.jl:304-507)
# ---------------------------------------------------------------------------


def deterministic_expand(params: Params, u: jax.Array) -> jax.Array:
    """Expand seed bits u into a mod-r polynomial (src/fhe.jl:304-307)."""
    return prng.prng_expand(u, params.t + 1)


def _encrypt_private(sk: PrivateKey, key: jax.Array, message: jax.Array):
    """Returns (u, RLWE(a, b)) — reference src/fhe.jl:310-328."""
    u, a, b = _encrypt_private_kernel(sk.params, sk.key, key, message)
    return u, RLWE(a, b)


@partial(jax.jit, static_argnums=(0,))
def _encrypt_private_kernel(params: Params, s_bits, key, message):
    mask = jnp.uint32(params.mask_r)
    k_u, k_w = jax.random.split(key)
    u = jax.random.bernoulli(k_u, 0.5, (params.n,)).astype(jnp.uint32)
    a = deterministic_expand(params, u)
    w_range = params.Dr // 8
    w = jax.random.randint(
        k_w, (params.n,), -w_range, w_range + 1, dtype=jnp.int32
    )
    b = pol.negacyclic_mul_bits(a, s_bits, params.mask_r, params.q_factors)
    b = (b + w.astype(jnp.uint32) + message.astype(jnp.uint32) * jnp.uint32(params.Dr)) & mask
    # keep only the top 5 bits (src/fhe.jl:325)
    shift = params.t - 4
    b = (b >> shift) << shift
    return u, a, b


def encrypt(key_obj, *args):
    """Private- or public-key encryption of n bits -> PackedCiphertext,
    uniform over key types like the reference's `encrypt`
    (src/fhe.jl:369-372 / 459-461):

        encrypt(sk, key, message)       # PrivateKey
        encrypt(pk, ctx, key, message)  # PublicKey (needs the NTT context)
    """
    if isinstance(key_obj, PrivateKey):
        key, message = args
        _, rlwe = _encrypt_private(key_obj, key, message)
        return PackedCiphertext(key_obj.params, rlwe)
    if isinstance(key_obj, PublicKey):
        ctx, key, message = args
        return encrypt_public(key_obj, ctx, key, message)
    raise TypeError(f"encrypt expects a PrivateKey or PublicKey, got {type(key_obj)}")


def encrypt_public(
    pk: PublicKey, ctx: SchemeContext, key: jax.Array, message: jax.Array
) -> PackedCiphertext:
    rlwe = _encrypt_public(pk, ctx, key, message)
    return PackedCiphertext(pk.params, rlwe)


def _encrypt_public(pk: PublicKey, ctx: SchemeContext, key: jax.Array, message):
    """Reference src/fhe.jl:386-409."""
    a, b = _encrypt_public_kernel(pk.params, ctx, pk.k0, pk.k1, key, message)
    return RLWE(a, b)


@partial(jax.jit, static_argnums=(0,))
def _encrypt_public_kernel(params: Params, ctx: SchemeContext, pk_k0, pk_k1,
                           key: jax.Array, message):
    k_u, k_w1, k_w2 = jax.random.split(key, 3)
    u = jax.random.randint(k_u, (params.n,), -1, 2, dtype=jnp.int32)
    w1_max = params.Dq // (41 * params.n)
    w2_max = params.Dq // 82
    w1 = jax.random.randint(k_w1, (params.n,), -w1_max, w1_max + 1, jnp.int32)
    w2 = jax.random.randint(k_w2, (params.n,), -w2_max, w2_max + 1, jnp.int32)
    new_max_b = params.r // (1 << (params.t - 5))

    if len(params.q_factors) > 1:
        # RNS q (n = 8192): residue-stack algebra + exact CRT rescale
        Lq = len(params.q_factors)
        p_vec = ctx.plan_q.p

        def to_q(x):
            if x.ndim == 1:
                x = jnp.broadcast_to(x, (Lq, params.n))
            return mm.embed_signed(x, p_vec, ctx.plan_q.mu, ctx.plan_q.r_mod_p)

        u_q = to_q(u)
        a1 = mm.addmod(ntt_mod.polymul(ctx.plan_q, pk_k0, u_q), to_q(w1), p_vec)
        a2 = mm.addmod(ntt_mod.polymul(ctx.plan_q, pk_k1, u_q), to_q(w2), p_vec)
        # + message * Dq: Dq > int32, so per-limb Shoup constants
        dq_res = jnp.asarray(
            np.array(
                [params.Dq % p for p in params.q_factors], dtype=np.uint32
            ).reshape(Lq, 1)
        )
        dq_shoup = jnp.asarray(
            np.array(
                [
                    mm.shoup_const(params.Dq % p, p)
                    for p in params.q_factors
                ],
                dtype=np.uint32,
            ).reshape(Lq, 1)
        )
        msg_dq = mm.shoup_mul(
            jnp.broadcast_to(message.astype(jnp.uint32), (Lq, params.n)),
            dq_res, dq_shoup, p_vec,
        )
        a2 = mm.addmod(a2, msg_dq, p_vec)
        a = rns_mod.rescale_exact(
            ctx.rns_q, a1, params.r, params.q_factors, True
        )
        b = rns_mod.rescale_exact(
            ctx.rns_q, a2, new_max_b, params.q_factors, False
        )
        b = b << (params.t - 5)
        return a, b

    q = jnp.uint32(params.q)

    def to_q1(x):
        return mm.embed_signed(
            x, jnp.uint32(params.q), ctx.plan_q.mu[0, 0], ctx.plan_q.r_mod_p[0, 0]
        )

    u_q = to_q1(u)[None, :]
    a1 = ntt_mod.polymul(ctx.plan_q, pk_k0[None, :], u_q)[0]
    a1 = mm.addmod(a1, to_q1(w1), q)
    a2 = ntt_mod.polymul(ctx.plan_q, pk_k1[None, :], u_q)[0]
    a2 = mm.addmod(a2, to_q1(w2), q)
    msg_dq = mm.mod_u32(
        message.astype(jnp.uint32) * jnp.uint32(params.Dq), q,
        jnp.uint32(mm.barrett_mu(params.q)),
    )
    a2 = mm.addmod(a2, msg_dq, q)

    # modulus switch q -> r (exact): a rounds to r, b floors to top-6-bit
    # grid. mm.rescale's int32 fixup needs q < 2^28; larger q (n >= 4096,
    # the reference's UInt128 regime) takes the multi-limb exact path.
    if params.q < (1 << 28):
        a = mm.rescale(params.r, a1, params.q, True)
        b = mm.rescale(new_max_b, a2, params.q, False)
    else:
        a = rns_mod.rescale_wide(params.r, a1, params.q, True)
        b = rns_mod.rescale_wide(new_max_b, a2, params.q, False)
    b = b << (params.t - 5)
    return a, b


def encrypt_optimal(key_obj, ctx_or_key, *rest):
    """Space-optimal encryption (reference src/fhe.jl:339-345, 420-435)."""
    from ..utils import bits as bits_mod

    if isinstance(key_obj, PrivateKey):
        key, message = ctx_or_key, rest[0]
        params = key_obj.params
        u, rlwe = _encrypt_private(key_obj, key, message)
        b_packed = rlwe.b >> (params.t - 4)
        v = bits_mod.unpackbits(b_packed, 5)
        return PrivateEncryptedCiphertext(params, u.astype(jnp.uint8), v)
    if isinstance(key_obj, PublicKey):
        ctx, key, message = ctx_or_key, rest[0], rest[1]
        params = key_obj.params
        rlwe = _encrypt_public(key_obj, ctx, key, message)
        a_bits = bits_mod.unpackbits(rlwe.a, params.t + 1)
        b_bits = bits_mod.unpackbits(rlwe.b >> (params.t - 5), 6)
        return PublicEncryptedCiphertext(params, a_bits, b_bits)
    raise TypeError(type(key_obj))


def normalize_ciphertext(ct) -> PackedCiphertext:
    """Space-optimal -> PackedCiphertext (reference src/fhe.jl:354-359,
    444-449)."""
    from ..utils import bits as bits_mod

    params = ct.params
    if isinstance(ct, PrivateEncryptedCiphertext):
        a = deterministic_expand(params, ct.u.astype(jnp.uint32))
        b = bits_mod.packbits(ct.v) << (params.t - 4)
        return PackedCiphertext(params, RLWE(a, b))
    if isinstance(ct, PublicEncryptedCiphertext):
        a = bits_mod.packbits(ct.a_bits)
        b = bits_mod.packbits(ct.b_bits) << (params.t - 5)
        return PackedCiphertext(params, RLWE(a, b))
    raise TypeError(type(ct))


def decrypt(sk: PrivateKey, ct) -> jax.Array:
    """RLWE decryption -> n bool bits (reference src/fhe.jl:471-494)."""
    return _decrypt_kernel(
        sk.params, isinstance(ct, Ciphertext), sk.key, ct.rlwe.a, ct.rlwe.b
    )


@partial(jax.jit, static_argnums=(0, 1))
def _decrypt_kernel(params: Params, extended: bool, s_bits, a, b):
    mask = jnp.uint32(params.mask_r)
    if extended:
        # length-m ring: helper primes are Q's (2m | p-1); length-n ring
        # uses q's factors (2n | p-1)
        s = pol.resize(s_bits, params.m)
        sa = pol.negacyclic_mul_bits(a, s, params.mask_r, params.moduli)
    else:
        sa = pol.negacyclic_mul_bits(a, s_bits, params.mask_r, params.q_factors)
    b1 = (b - sa) & mask
    b1 = b1[..., : params.n]
    snapped = (b1 + jnp.uint32(params.Dr // 2)) & mask
    return (snapped // jnp.uint32(params.Dr)).astype(jnp.bool_)


def split_ciphertext(ct) -> EncryptedBit:
    """RLWE -> n LWEs, batched as one EncryptedBit with leading axis n
    (reference src/fhe.jl:287-290)."""
    params = ct.params
    n = params.n
    a = ct.rlwe.a
    length = a.shape[-1]  # n for PackedCiphertext, m for Ciphertext
    # extract for every bit index i: out[i, k] = a[i-k] if k <= i else
    # -a[length+i-k] (negacyclic wrap pulls from the tail of the full poly)
    i_idx = jnp.arange(n)[:, None]
    k_idx = jnp.arange(n)[None, :]
    src = (i_idx - k_idx) % length
    neg = k_idx > i_idx
    g = a[..., src]
    g = jnp.where(neg, (-g) & jnp.uint32(params.mask_r), g)
    b = ct.rlwe.b[..., :n]
    return EncryptedBit(LWE(g, b))


def decrypt_bit(sk: PrivateKey, enc_bit: EncryptedBit) -> jax.Array:
    """LWE decryption -> bool (reference src/fhe.jl:504-507); batched."""
    params = sk.params
    mask = jnp.uint32(params.mask_r)
    dot = jnp.sum(
        enc_bit.lwe.a.astype(jnp.uint32) * sk.key.astype(jnp.uint32), axis=-1
    )
    b1 = (enc_bit.lwe.b - dot) & mask
    return (((b1 + jnp.uint32(params.Dr // 2)) & mask) // jnp.uint32(params.Dr)).astype(
        jnp.bool_
    )
