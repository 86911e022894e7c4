"""Scheme 2: k-bit message FHE (Case/Gao/Hu/Xu, eprint 2019/521).

TPU-native rebuild of reference src/fhe2.jl + src/rns.jl. The reference marks
this module experimental and implements parameters, keys (including the
BootstrapKey — constructed but never used, src/fhe2.jl:6,
examples/test_scheme2.jl:26) and encrypt/decrypt; no scheme-2 bootstrap
exists upstream, and none is claimed here.

Parameter deviations (documented, value-preserving):
 - Q: the reference takes Q = B*Bp for two ~34-bit primes (src/fhe2.jl:57-60)
   — too wide for uint32 lanes. We keep Q >= (the reference's Bp lower
   bound)^2 but split it over balanced NTT-friendly primes < 2^29, reusing the
   same RNS/mixed-radix machinery as scheme 1 (which is exactly the design
   this module pioneered upstream).
 - q: for k >= 2 the reference's q = find_modulus(2n, 2^7 r n) exceeds 2^28
   (k=5: ~2^33), so q too becomes a product of NTT-friendly primes < 2^28
   with the same lower bound, and the q->r modulus switch uses the RNS
   CRT-interpolation rescale (±1 LSB, bounded noise) instead of the exact
   single-word path.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import modmath as mm
from ..ops import ntt as ntt_mod
from ..ops import poly as pol
from ..ops import rns as rns_mod
from ..utils import primes as pr
from ..utils import prng


@dataclasses.dataclass(frozen=True)
class Params:
    """Reference src/fhe2.jl:17-71, `Params(k)`."""

    n: int
    k: int
    r: int
    m: int
    t: int
    q_moduli: tuple[int, ...]
    tau: int
    moduli: tuple[int, ...]  # RNS primes for Q
    Dr: int
    Dq: int

    @classmethod
    def create(cls, k: int, n: int | None = None) -> "Params":
        """Paper §6.1 parameter sets: k in 1..5, n = 2^10.

        `n` may be overridden with a smaller power of FOUR (so that sqrt(n)
        and hence r stay powers of two) for fast unit tests; the paper's
        security analysis assumes n >= 1024, so non-default n is test-only.
        """
        assert 1 <= k <= 5, "paper provides parameter sets for k in 1..5"
        if n is None:
            n = 2**10
        sqrt_n = math.isqrt(n)
        assert sqrt_n * sqrt_n == n and sqrt_n & (sqrt_n - 1) == 0 and n >= 64, (
            "n must be a power of four >= 64 (sqrt(n) enters r's derivation)"
        )
        r = 2 ** (k + 6) * sqrt_n
        m = r // 2
        l = 2  # the reference's decomposition length (noise-bound input only)
        t = math.ceil(math.log2(r)) - 1

        q_min = 2**7 * r * n
        if q_min < (1 << 27):
            q_moduli = (pr.find_modulus(2 * n, q_min),)
        else:
            count = max(2, math.ceil(q_min.bit_length() / 27))
            q_moduli = pr.find_rns_primes(
                2 * n, q_min, q_min * 2, count, limit=1 << 28
            )

        tau = 2 * sqrt_n
        bound = 15 * 2 ** (2 * k + 2) * r * tau * math.isqrt(2 * l * m)
        qmin_Q = bound * bound
        count_Q = max(2, math.ceil(qmin_Q.bit_length() / 28))
        moduli = pr.find_rns_primes(2 * m, qmin_Q, qmin_Q * 2, count_Q)

        q = 1
        for p in q_moduli:
            q *= p
        return cls(
            n=n, k=k, r=r, m=m, t=t, q_moduli=q_moduli, tau=tau,
            moduli=moduli, Dr=r // 2 ** (k + 2), Dq=q // 2 ** (k + 2),
        )

    @property
    def q(self) -> int:
        prod = 1
        for p in self.q_moduli:
            prod *= p
        return prod

    @property
    def Q(self) -> int:
        prod = 1
        for p in self.moduli:
            prod *= p
        return prod

    @property
    def DQ(self) -> int:
        return self.Q // 2 ** (self.k + 2)

    @property
    def num_limbs(self) -> int:
        return len(self.moduli)

    @property
    def num_digits(self) -> int:
        return len(self.moduli)

    @property
    def mask_r(self) -> int:
        return self.r - 1


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Scheme2Context:
    plan_Q: ntt_mod.NttPlan
    plan_q: ntt_mod.NttPlan
    rns_Q: rns_mod.RnsContext
    rns_q: rns_mod.RnsContext  # rescale target r
    fused: object  # fused_mod.FusedTables — shared with the scheme-1 kernels

    @property
    def rns(self) -> rns_mod.RnsContext:
        """Alias so the shared blind-rotation core (models/bootstrap.py
        `blind_rotate`, ops/fused.py kernels) can consume this context."""
        return self.rns_Q


def make_context(params: Params) -> Scheme2Context:
    from ..ops import fused as fused_mod

    plan_Q = ntt_mod.build_plan(params.moduli, params.m)
    plan_q = ntt_mod.build_plan(params.q_moduli, params.n)
    host_Q = rns_mod.build_context(params.moduli)
    host_q = rns_mod.build_context(params.q_moduli)
    return Scheme2Context(
        plan_Q=plan_Q,
        plan_q=plan_q,
        rns_Q=host_Q.device_context(),
        rns_q=host_q.device_context(),
        fused=fused_mod.build_fused(plan_Q),
    )


@dataclasses.dataclass
class PrivateKey:
    params: Params
    key: jax.Array  # (n,) bits

    @classmethod
    def create(cls, params: Params, key: jax.Array) -> "PrivateKey":
        bits = jax.random.bernoulli(key, 0.5, (params.n,)).astype(jnp.uint32)
        return cls(params, bits)


@dataclasses.dataclass
class PublicKey:
    """Reference src/fhe2.jl:134-156."""

    params: Params
    k0: jax.Array  # (Lq, n)
    k1: jax.Array

    @classmethod
    def create(cls, ctx: Scheme2Context, sk: PrivateKey, key) -> "PublicKey":
        params = sk.params
        Lq = len(params.q_moduli)
        n = params.n
        k_u, k_e = jax.random.split(key)
        keys_u = jax.random.split(k_u, Lq)
        k0 = jnp.stack(
            [
                jax.random.randint(keys_u[i], (n,), 0, p, dtype=jnp.int32).astype(
                    jnp.uint32
                )
                for i, p in enumerate(params.q_moduli)
            ]
        )
        dq, rr = divmod(params.Dq, 512 * params.n)
        e_max = dq - (1 if rr == 0 else 0)
        e = jax.random.randint(k_e, (1, n), -e_max, e_max + 1, dtype=jnp.int32)
        plan_q = ctx.plan_q
        p_vec = plan_q.p
        e_mod = mm.embed_signed(e, p_vec, plan_q.mu, plan_q.r_mod_p)
        s_q = jnp.broadcast_to(sk.key, (Lq, n)).astype(jnp.uint32)
        k1 = ntt_mod.polymul(ctx.plan_q, k0, s_q)
        k1 = mm.addmod(k1, e_mod, p_vec)
        return cls(params, k0, k1)


@dataclasses.dataclass
class BootstrapKey:
    """Reference src/fhe2.jl:104-131 — same GSW structure as scheme 1 with
    noise ±tau; constructed for parity (the reference never consumes it)."""

    params: Params
    hat: jax.Array        # (n, 2l, 2, L, m)
    hat_shoup: jax.Array
    seed: "np.ndarray | None" = None  # PRNG key data for the a-column

    # key-index chunk for device generation: the k=4 key is 4.3 GiB (hat),
    # and the one-shot kernel holds ~4 key-sized intermediates — chunking
    # bounds device memory at ~2 GiB regardless of k. The chunked stream is
    # CANONICAL (chunk c draws from fold_in(k_a, c)), so seeded
    # regeneration (from_seeded) reproduces create() bit-for-bit.
    KEY_CHUNK = 128

    @classmethod
    def create(cls, ctx: Scheme2Context, sk: PrivateKey, key) -> "BootstrapKey":
        from .scheme1 import _shoup_companion
        from ..utils import progress

        params = sk.params
        n, m, L = params.n, params.m, params.num_limbs
        rows = 2 * params.num_digits
        k_a, k_e = jax.random.split(key)
        chunk = min(cls.KEY_CHUNK, n)
        hat_np = np.empty((n, rows, 2, L, m), dtype=np.uint32)
        with progress.stage(
            f"Scheme2 BootstrapKey.create k={params.k} "
            f"({hat_np.nbytes >> 20} MiB hat, {n // chunk} chunks)"
        ):
            for ci in range(n // chunk):
                h = _bkey2_chunk(
                    params, ctx, sk.key, sk.key[ci * chunk:(ci + 1) * chunk],
                    jax.random.fold_in(k_a, ci), jax.random.fold_in(k_e, ci),
                )
                hat_np[ci * chunk:(ci + 1) * chunk] = np.asarray(h)
        with progress.stage("Scheme2 BootstrapKey shoup companions (host)"):
            shoup = _shoup_companion(hat_np, params.moduli)
        return cls(
            params, jnp.asarray(hat_np), jnp.asarray(shoup),
            seed=np.asarray(jax.random.key_data(k_a)),
        )

    @classmethod
    def from_seeded(
        cls, params: Params, ctx: Scheme2Context, seed, b_hat
    ) -> "BootstrapKey":
        """Rebuild from (seed, b-column) — see scheme-1 BootstrapKey.
        Regenerates the a-column with the same canonical chunked stream as
        `create` (chunk c <- fold_in(k_a, c))."""
        from .scheme1 import _shoup_companion, _uniform_residues

        n, m, L = params.n, params.m, params.num_limbs
        rows = 2 * params.num_digits
        k_a = jax.random.wrap_key_data(jnp.asarray(seed, dtype=jnp.uint32))
        chunk = min(cls.KEY_CHUNK, n)
        b_np = np.asarray(b_hat)
        hat_np = np.empty((n, rows, 2, L, m), dtype=np.uint32)
        for ci in range(n // chunk):
            a = _uniform_residues(
                jax.random.fold_in(k_a, ci), (chunk, rows, L, m),
                params.moduli,
            )
            a_hat = ntt_mod.ntt_fwd(ctx.plan_Q, a)
            hat_np[ci * chunk:(ci + 1) * chunk, :, 0] = np.asarray(a_hat)
            hat_np[ci * chunk:(ci + 1) * chunk, :, 1] = (
                b_np[ci * chunk:(ci + 1) * chunk]
            )
        shoup = _shoup_companion(hat_np, params.moduli)
        return cls(
            params, jnp.asarray(hat_np), jnp.asarray(shoup),
            seed=np.asarray(seed),
        )


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnums=(0,))
def _bkey2_chunk(params: Params, ctx: Scheme2Context, s_bits, s_chunk,
                 k_a_c, k_e_c):
    """Device computation of ONE key-index chunk of the scheme-2 bootstrap
    key (jitted; eager per-op dispatch costs minutes over the device
    tunnel). s_bits: the full (n,) key (extends to s_ext); s_chunk: the
    (chunk,) slice whose GSW rows this call produces; k_a_c/k_e_c: the
    chunk's folded subkeys. Gadget terms ride the b-column only (uniform,
    seed-regenerable a-column) — see scheme-1 `_bkey_kernel` for the
    algebra."""
    from .scheme1 import _uniform_residues

    m, L = params.m, params.num_limbs
    l = params.num_digits
    rows = 2 * l
    nc = s_chunk.shape[0]
    plan = ctx.plan_Q
    p_vec = plan.p

    a = _uniform_residues(k_a_c, (nc, rows, L, m), params.moduli)
    e = jax.random.randint(
        k_e_c, (nc, rows, 1, m), -params.tau, params.tau + 1, dtype=jnp.int32
    )
    e_mod = mm.embed_signed(e, p_vec, plan.mu, plan.r_mod_p)

    s_ext = pol.resize(s_bits, m)
    s_rns = jnp.broadcast_to(s_ext, (L, m)).astype(jnp.uint32)
    s_hat = ntt_mod.ntt_fwd(plan, s_rns)
    b = ntt_mod.ntt_inv(
        plan, ntt_mod.pointwise_mul(plan, ntt_mod.ntt_fwd(plan, a), s_hat)
    )
    b = mm.addmod(b, e_mod, p_vec)

    wv = ctx.rns_Q.w_val[..., 0]  # (l, L)
    add0 = (s_chunk[:, None, None] * wv[None]).astype(jnp.uint32)
    term = add0[:, :, :, None] * s_rns[None, None]  # (nc, l, L, m), < 2^30
    b = b.at[:, :l].set(mm.submod(b[:, :l], term, p_vec))
    delta = jnp.zeros((nc, l, L, m), dtype=jnp.uint32)
    delta = delta.at[:, :, :, 0].set(add0)
    b = b.at[:, l:].set(mm.addmod(b[:, l:], delta, p_vec))

    C = jnp.stack([a, b], axis=2)
    return ntt_mod.ntt_fwd(plan, C)


def deterministic_expand(params: Params, u: jax.Array) -> jax.Array:
    return prng.prng_expand(u, params.t + 1)


def encrypt(key_obj, ctx_or_key, *rest):
    """k-bit digit encryption (reference src/fhe2.jl:165-210).

    PrivateKey: encrypt(sk, key, message) -> (a, b) polys mod r.
    PublicKey:  encrypt(pk, ctx, key, message).
    Messages: (n,) ints in [0, 2^k).
    """
    if isinstance(key_obj, PrivateKey):
        key, message = ctx_or_key, rest[0]
        return _encrypt_private(key_obj, key, message)
    if isinstance(key_obj, PublicKey):
        ctx, key, message = ctx_or_key, rest[0], rest[1]
        return _encrypt_public(key_obj, ctx, key, message)
    raise TypeError(type(key_obj))


def _encrypt_private(sk: PrivateKey, key, message):
    params = sk.params
    mask = jnp.uint32(params.mask_r)
    k_u, k_w = jax.random.split(key)
    u = jax.random.bernoulli(k_u, 0.5, (params.n,)).astype(jnp.uint32)
    a = deterministic_expand(params, u)
    w_range = params.Dr // 8
    w = jax.random.randint(k_w, (params.n,), -w_range, w_range + 1, jnp.int32)
    wmat = pol.toeplitz_from_small(sk.key)
    b = pol.negacyclic_matmul_mask(a, wmat, params.mask_r)
    b = (b + w.astype(jnp.uint32) + message.astype(jnp.uint32) * jnp.uint32(params.Dr)) & mask
    shift = params.t - params.k - 4
    b = (b >> shift) << shift
    return a, b


def _encrypt_public(pk: PublicKey, ctx: Scheme2Context, key, message):
    params = pk.params
    Lq = len(params.q_moduli)
    p_vec = ctx.plan_q.p
    k_u, k_w1, k_w2 = jax.random.split(key, 3)
    u = jax.random.randint(k_u, (1, params.n), -1, 2, dtype=jnp.int32)
    w1_max = params.Dq // (64 * params.n)
    w2_max = params.Dq // 512
    w1 = jax.random.randint(k_w1, (1, params.n), -w1_max, w1_max + 1, jnp.int32)
    w2 = jax.random.randint(k_w2, (1, params.n), -w2_max, w2_max + 1, jnp.int32)

    plan_q = ctx.plan_q

    def to_q(x):
        return mm.embed_signed(x, p_vec, plan_q.mu, plan_q.r_mod_p)

    u_q = to_q(jnp.broadcast_to(u, (Lq, params.n)))
    a1 = mm.addmod(ntt_mod.polymul(ctx.plan_q, pk.k0, u_q), to_q(w1), p_vec)
    b1 = mm.addmod(ntt_mod.polymul(ctx.plan_q, pk.k1, u_q), to_q(w2), p_vec)
    dq_res = jnp.asarray(
        np.array(
            [params.Dq % p for p in params.q_moduli], dtype=np.uint32
        ).reshape(Lq, 1)
    )
    dq_shoup = jnp.asarray(
        np.array(
            [mm.shoup_const(params.Dq % p, p) for p in params.q_moduli],
            dtype=np.uint32,
        ).reshape(Lq, 1)
    )
    msg_dq = mm.shoup_mul(
        jnp.broadcast_to(message.astype(jnp.uint32), (Lq, params.n)),
        dq_res, dq_shoup, p_vec,
    )
    b1 = mm.addmod(b1, msg_dq, p_vec)

    # modulus switch q -> r (reference src/fhe2.jl:202-207)
    a = _switch_q_to_r(params, ctx, a1, params.r, round_result=True)
    grid = 1 << (params.t - params.k - 5)
    b = _switch_q_to_r(params, ctx, b1, params.r // grid, round_result=False)
    b = b << (params.t - params.k - 5)
    return a, b


def _switch_q_to_r(params, ctx, x, new_max, round_result):
    """Exact modulus switch q -> new_max (round or floor), matching the
    reference's `reduce_modulus` semantics (src/fhe2.jl:202-207 via
    src/utils.jl:78-127) bit-for-bit for both the single-prime and RNS q."""
    if len(params.q_moduli) == 1:
        return mm.rescale(new_max, x[0], params.q_moduli[0], round_result)
    return rns_mod.rescale_exact(
        ctx.rns_q, x, new_max, params.q_moduli, round_result
    )


def decrypt(sk: PrivateKey, a: jax.Array, b: jax.Array) -> jax.Array:
    """Reference src/fhe2.jl:213-236; returns (n,) ints in [0, 2^k)."""
    params = sk.params
    mask = jnp.uint32(params.mask_r)
    wmat = pol.toeplitz_from_small(sk.key)
    sa = pol.negacyclic_matmul_mask(a, wmat, params.mask_r)
    b1 = (b - sa) & mask
    snapped = (b1 + jnp.uint32(params.Dr // 2)) & mask
    return (snapped // jnp.uint32(params.Dr)).astype(jnp.int32)


# The functional bootstrap consuming BootstrapKey — capability the reference
# never finished (src/fhe2.jl:6). Re-exported lazily (bootstrap2 imports this
# module, so an eager import here would be circular).
_BOOTSTRAP2_EXPORTS = frozenset(
    {
        "bootstrap", "add_with_carry", "mul", "apply_lut", "refresh",
        "split_ciphertext", "decrypt_lwe", "lwe_phase_noise",
        "make_table", "tables_hat",
    }
)


def __getattr__(name: str):
    if name in _BOOTSTRAP2_EXPORTS:
        from . import bootstrap2

        return getattr(bootstrap2, name)
    if name == "wideint":  # encrypted wide-integer arithmetic on k-bit digits
        from . import wideint

        return wideint
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
