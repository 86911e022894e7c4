"""Sharded bootstrap and packing over a ('dp', 'tp') mesh.

TPU-native equivalents of parallelism the reference does not have
(SURVEY.md §2.4):

 - `bootstrap_batch_sharded`: gates shard over 'dp' (and 'tp' when free); the
   bootstrap key replicates (n=64: ~14 MB in NTT form) — pure data
   parallelism, zero collectives in the hot loop.
 - `pack_encrypted_bits_sharded`: the n independent trivial-input bootstraps
   shard over the mesh as a gate batch, and the n-term shortened-external-
   product reduction (reference src/fhe.jl:683-687) becomes a psum over 'tp' —
   genuine tensor parallelism over the key-index axis.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models import bootstrap as bs
from ..models.params import Params
from ..models.scheme1 import LWE, RLWE, Ciphertext, SchemeContext
from ..ops import modmath as mm
from ..ops import ntt as ntt_mod
from ..ops import poly as pol
from ..ops import rns as rns_mod


def _pad_to(batch_arrays, multiple: int):
    """Pad leading (gate) axis up to a multiple; returns (padded, original)."""
    B = batch_arrays[0].shape[0]
    padded = ((B + multiple - 1) // multiple) * multiple
    if padded == B:
        return batch_arrays, B
    out = []
    for a in batch_arrays:
        pad = [(0, padded - B)] + [(0, 0)] * (a.ndim - 1)
        out.append(jnp.pad(a, pad))
    return out, B


def bootstrap_batch_sharded(params: Params, ctx: SchemeContext, bkey, lwe1: LWE,
                            lwe2: LWE, mesh):
    """Gate batch sharded over every mesh device ('dp' and 'tp' both act as
    data axes here); bkey and context replicated. Any batch size works — the
    batch is zero-padded up to the device count and trimmed on return."""
    spec_b = P(("dp", "tp"))
    spec_r = P()
    ndev = mesh.devices.size
    (a1, b1, a2, b2), B = _pad_to([lwe1.a, lwe1.b, lwe2.a, lwe2.b], ndev)
    lwe1 = LWE(a1, b1)
    lwe2 = LWE(a2, b2)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_r, spec_r, spec_r, (spec_b, spec_b), (spec_b, spec_b)),
        out_specs=((spec_b, spec_b),) * 3,
        check_vma=False,
    )
    def run(bkey_hat, bkey_shoup, ctx_, lwe1_, lwe2_):
        res = bs.bootstrap_internal(
            params, ctx_, bkey_hat, bkey_shoup, lwe1_[0], lwe1_[1], lwe2_[0],
            lwe2_[1], None,
        )
        out = []
        for t in res:
            lw = bs._reduce_lwe(params, ctx_, t)
            out.append((lw.a, lw.b))
        return tuple(out)

    res = run(bkey.hat, bkey.hat_shoup, ctx, (lwe1.a, lwe1.b), (lwe2.a, lwe2.b))
    return tuple(LWE(a[:B], b[:B]) for a, b in res)


def pack_encrypted_bits_sharded(params: Params, ctx: SchemeContext, bkey,
                                enc_bits: LWE, mesh) -> Ciphertext:
    """Distributed repack: bootstraps shard over dp×tp as gates; the key-index
    reduction runs as psum over the full mesh."""
    n, m, L, l = params.n, params.m, params.num_limbs, params.num_digits
    spec_gate = P(("dp", "tp"))
    spec_r = P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_r, spec_r, spec_r, (spec_gate, spec_gate), spec_gate),
        out_specs=(spec_r, spec_r),
        check_vma=False,
    )
    def run(bkey_hat, bkey_shoup, ctx_, bits, my_idx):
        a_bits, b_bits = bits
        shard = a_bits.shape[0]
        a_triv = jnp.zeros((shard, n), dtype=jnp.uint32)
        b_triv = jnp.full((shard,), params.Dr, dtype=jnp.uint32)
        (a_q, b_q), _, _ = bs.bootstrap_internal(
            params, ctx_, bkey_hat, bkey_shoup, a_triv, b_triv, a_bits, b_bits,
            None,
        )
        # local LWEs correspond to global gate indices my_idx (shard,).
        # Build the i-indexed polynomials by all_gathering the small LWE
        # outputs (n x (n+1) mod-Q values; tiny), then flatten/NTT the i-rows
        # this device owns.
        plan = ctx_.plan_Q
        p = plan.p
        a_all = jax.lax.all_gather(
            a_q, axis_name=("dp", "tp"), tiled=True
        )  # (n_gates, L, n)
        b_all = jax.lax.all_gather(b_q, axis_name=("dp", "tp"), tiled=True)
        # rows of as_polys owned by this device: global key indices my_idx
        as_mine = jnp.transpose(a_all[:, :, :], (2, 1, 0))[my_idx]  # (shard, L, n)
        as_mine = pol.resize(as_mine, m)
        d = rns_mod.flatten(ctx_.rns, as_mine)  # (shard, l, L, m)
        d_hat = ntt_mod.ntt_fwd(plan, d)
        acc = [None, None]
        bk_hat_mine = bkey_hat[my_idx]
        bk_shoup_mine = bkey_shoup[my_idx]
        for c in range(2):
            for i in range(l):
                prod = mm.shoup_mul(
                    d_hat[:, i], bk_hat_mine[:, l + i, c],
                    bk_shoup_mine[:, l + i, c], p,
                )
                acc[c] = prod if acc[c] is None else mm.addmod(acc[c], prod, p)
        w_loc = bs._sum_mod(acc[0], p)  # (L, m)
        v_loc = bs._sum_mod(acc[1], p)
        # modular psum over the mesh: psum would overflow uint32, so gather
        # per-device partials and reduce modularly
        w_parts = jax.lax.all_gather(w_loc, axis_name=("dp", "tp"))  # (D, L, m)
        v_parts = jax.lax.all_gather(v_loc, axis_name=("dp", "tp"))
        w_hat = bs._sum_mod(w_parts, p)
        v_hat = bs._sum_mod(v_parts, p)
        w_tilde = ntt_mod.ntt_inv(plan, w_hat)
        v_tilde = ntt_mod.ntt_inv(plan, v_hat)
        b_poly = pol.resize(jnp.transpose(b_all, (1, 0)), m)
        w1 = mm.negmod(w_tilde, p)
        v1 = mm.submod(b_poly, v_tilde, p)
        w_r = rns_mod.rescale_exact(ctx_.rns, w1, params.r, params.moduli)
        v_r = rns_mod.rescale_exact(ctx_.rns, v1, params.r, params.moduli)
        return w_r, v_r

    idx = jnp.arange(n, dtype=jnp.int32)
    w_r, v_r = run(bkey.hat, bkey.hat_shoup, ctx, (enc_bits.a, enc_bits.b), idx)
    return Ciphertext(params, RLWE(w_r, v_r))


# ---------------------------------------------------------------------------
# Scheme-2 sharded batch encryption/decryption (BASELINE config 5: the k-bit
# variant distributed over a mesh — the reference is single-process,
# SURVEY.md §2.4; here message blocks shard over every mesh axis)
# ---------------------------------------------------------------------------


def scheme2_encrypt_batch_sharded(sk2, keys, messages, mesh):
    """Private-key encrypt a batch of scheme-2 message blocks, sharded.

    keys: (B,) PRNG keys; messages: (B, n) ints in [0, 2^k).
    Returns (a, b) with leading batch axis, sharded over ('dp','tp').
    Any B works (padded up to the device count, trimmed on return)."""
    from ..models import scheme2 as s2

    params2 = sk2.params
    spec_b = P(("dp", "tp"))
    ndev = mesh.devices.size
    B = messages.shape[0]
    padded = ((B + ndev - 1) // ndev) * ndev
    if padded != B:
        keys = jnp.concatenate(
            [keys, jnp.broadcast_to(keys[:1], (padded - B,) + keys.shape[1:])]
        )
        messages = jnp.pad(messages, ((0, padded - B), (0, 0)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec_b, spec_b),
        out_specs=(spec_b, spec_b),
        check_vma=False,
    )
    def run(s_bits, keys_, msgs_):
        sk = s2.PrivateKey(params2, s_bits)
        return jax.vmap(lambda kk, msg: s2._encrypt_private(sk, kk, msg))(
            keys_, msgs_
        )

    a, b = run(sk2.key, keys, messages)
    return a[:B], b[:B]


def scheme2_decrypt_batch_sharded(sk2, a, b, mesh):
    """Decrypt a sharded batch of scheme-2 ciphertexts -> (B, n) digits."""
    from ..models import scheme2 as s2

    params2 = sk2.params
    spec_b = P(("dp", "tp"))
    ndev = mesh.devices.size
    (a, b), B = _pad_to([a, b], ndev)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec_b, spec_b),
        out_specs=spec_b,
        check_vma=False,
    )
    def run(s_bits, a_, b_):
        sk = s2.PrivateKey(params2, s_bits)
        return jax.vmap(lambda aa, bb: s2.decrypt(sk, aa, bb))(a_, b_)

    return run(sk2.key, a, b)[:B]
