"""Scheme-2 smoke (reference examples/test_scheme2.jl): build params/keys,
encrypt and decrypt k-bit digits with both key types, construct the
BootstrapKey."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import jax
import jax.numpy as jnp

from sgfhe_tpu.models import scheme2 as s2


def main(k=1, with_bootstrap_key=False):
    params = s2.Params.create(k)
    print(
        f"k={k}: n={params.n} r={params.r} q~2^{params.q.bit_length()} "
        f"Q~2^{params.Q.bit_length()} limbs={params.moduli}"
    )
    ctx = s2.make_context(params)
    key = jax.random.key(0)
    k_sk, k_pk, k_bk, k_m, k_e1, k_e2 = jax.random.split(key, 6)
    sk = s2.PrivateKey.create(params, k_sk)
    pk = s2.PublicKey.create(ctx, sk, k_pk)

    msg = np.asarray(jax.random.randint(k_m, (params.n,), 0, 2**k))
    a, b = s2.encrypt(sk, k_e1, jnp.asarray(msg))
    assert (np.asarray(s2.decrypt(sk, a, b)) == msg).all()
    print("private k-bit roundtrip ok")

    a, b = s2.encrypt(pk, ctx, k_e2, jnp.asarray(msg))
    assert (np.asarray(s2.decrypt(sk, a, b)) == msg).all()
    print("public k-bit roundtrip ok")

    if with_bootstrap_key:
        bkey = s2.BootstrapKey.create(ctx, sk, k_bk)
        print("bootstrap key:", bkey.hat.shape)


if __name__ == "__main__":
    import sys

    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1,
         with_bootstrap_key="--bkey" in sys.argv)
