"""Circuit-evaluation layer: scheduling (levels, pair sharing, constant
folding) against the plaintext oracle, and encrypted end-to-end evaluation
vs that oracle at n=64 (jnp path on the CPU backend)."""

import itertools

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import sgfhe_tpu as F
from sgfhe_tpu import circuit as C


# -- structural tests (no crypto) --------------------------------------------


def test_constant_folding_and_sharing():
    c = C.Circuit()
    x, y = c.input(), c.input()
    one, zero = c.const(1), c.const(0)
    assert c.and_(x, one) == x
    assert c.and_(x, zero) == zero
    assert c.or_(x, zero) == x
    assert c._wires[c.or_(x, one)].op == "const"
    assert c.xor_(x, zero) == x
    assert c.xor_(x, x) == zero
    assert c.and_(x, x) == x
    nx = c.not_(x)
    assert c.not_(nx) == x                      # double negation
    assert c._const_of(c.and_(x, nx)) == 0      # complementary wires
    assert c._const_of(c.or_(x, nx)) == 1
    assert c._const_of(c.xor_(x, nx)) == 1
    # pair sharing: AND/OR/XOR of one pair -> one scheduled bootstrap
    g1, g2, g3 = c.and_(x, y), c.or_(x, y), c.xor_(y, x)  # (order-insensitive)
    for g in (g1, g2, g3):
        c.output(g)
    assert c.num_bootstraps == 1
    assert c.depth == 1


def test_dead_gates_not_scheduled():
    c = C.Circuit()
    x, y = c.input(), c.input()
    c.and_(x, y)          # never output
    c.output(c.xor_(x, y))
    assert c.num_bootstraps == 1  # shares the live pair's bootstrap


def test_adder_cost_model():
    c = C.ripple_adder(8)
    # bit 0: half adder = 1 bootstrap (carry-in folds); bits 1..7: 3 each
    assert c.num_bootstraps == 1 + 7 * 3
    assert c.depth == 15
    assert c.num_inputs == 16 and c.num_outputs == 9


@pytest.mark.parametrize("nbits", [1, 3])
def test_plain_oracle_adder(nbits):
    c = C.ripple_adder(nbits)
    for a in range(1 << nbits):
        for b in range(1 << nbits):
            bits = [(a >> i) & 1 for i in range(nbits)] + [
                (b >> i) & 1 for i in range(nbits)
            ]
            out = C.evaluate_plain(c, bits)
            total = sum(v << i for i, v in enumerate(out))
            assert total == a + b


def test_plain_oracle_equality():
    c = C.equality(4)
    for a in range(16):
        for b in (a, (a + 5) % 16, a ^ 1):
            bits = [(a >> i) & 1 for i in range(4)] + [
                (b >> i) & 1 for i in range(4)
            ]
            assert C.evaluate_plain(c, bits) == [int(a == b)]


# -- encrypted end-to-end -----------------------------------------------------


@pytest.fixture(scope="module")
def setup64():
    params = F.Params.create(64)
    ctx = F.make_context(params)
    k = jax.random.split(jax.random.key(42), 2)
    sk = F.PrivateKey.create(params, k[0])
    bkey = F.BootstrapKey.create(ctx, sk, k[1])
    return params, ctx, sk, bkey


def _encrypt_bits(params, sk, key, plain_rows):
    """plain_rows: (B, num_inputs) 0/1 -> list of EncryptedBit, each (B, n)."""
    rows = np.asarray(plain_rows, dtype=np.uint8)
    B, k = rows.shape
    n = params.n
    # pad each instance's input bits into one n-bit message and split
    ebs = []
    keys = jax.random.split(key, B)
    all_bits = []
    for i in range(B):
        msg = np.zeros(n, dtype=bool)
        msg[:k] = rows[i].astype(bool)
        ct = F.encrypt(sk, keys[i], jnp.asarray(msg))
        all_bits.append(F.split_ciphertext(ct).lwe)
    for j in range(k):
        a = jnp.stack([all_bits[i].a[j] for i in range(B)])
        b = jnp.stack([all_bits[i].b[j] for i in range(B)])
        ebs.append(F.EncryptedBit(F.LWE(a, b)))
    return ebs


def test_full_adder_encrypted_all_cases(setup64):
    """One SIMD evaluation covers the full 3-input truth table of a full
    adder (8 instances in the batch)."""
    params, ctx, sk, bkey = setup64
    c = C.Circuit()
    a, b, cin = c.input(), c.input(), c.input()
    axb = c.xor_(a, b)
    c.output(c.xor_(axb, cin))                       # sum
    c.output(c.or_(c.and_(a, b), c.and_(axb, cin)))  # carry
    assert c.num_bootstraps == 3
    rows = np.array(list(itertools.product([0, 1], repeat=3)))
    ebs = _encrypt_bits(params, sk, jax.random.key(1), rows)
    outs = C.evaluate(c, params, ctx, bkey, ebs)
    got_s = np.asarray(F.decrypt_bit(sk, outs[0])).astype(int)
    got_c = np.asarray(F.decrypt_bit(sk, outs[1])).astype(int)
    for i, (x, y, z) in enumerate(rows):
        assert got_s[i] == (x ^ y ^ z)
        assert got_c[i] == int(x + y + z >= 2)


def test_adder_encrypted(setup64):
    params, ctx, sk, bkey = setup64
    nbits = 4
    c = C.ripple_adder(nbits)
    rng = np.random.default_rng(3)
    pairs = [(int(rng.integers(0, 16)), int(rng.integers(0, 16)))
             for _ in range(4)]
    rows = np.array([
        [(a >> i) & 1 for i in range(nbits)] + [(b >> i) & 1
                                                for i in range(nbits)]
        for a, b in pairs
    ])
    ebs = _encrypt_bits(params, sk, jax.random.key(2), rows)
    outs = C.evaluate(c, params, ctx, bkey, ebs)
    dec = [np.asarray(F.decrypt_bit(sk, o)).astype(int) for o in outs]
    for j, (a, b) in enumerate(pairs):
        total = sum(dec[i][j] << i for i in range(nbits + 1))
        assert total == a + b, (a, b, total)


def test_random_circuits_vs_oracle(setup64):
    """Random DAGs over all gate types (incl. free NOT/NAND/XNOR and consts)
    must match the plaintext oracle; also exercises unbatched inputs and
    randomized flattening."""
    params, ctx, sk, bkey = setup64
    rng = np.random.default_rng(7)
    c = C.Circuit()
    wires = [c.input() for _ in range(4)] + [c.const(0), c.const(1)]
    for _ in range(12):
        op = rng.choice(["and", "or", "xor", "nand", "nor", "xnor", "not"])
        x, y = rng.choice(len(wires), 2)
        if op == "not":
            wires.append(c.not_(wires[x]))
        else:
            wires.append(getattr(c, op if op in ("nand", "nor", "xnor")
                                 else op + "_")(wires[x], wires[y]))
    for w in wires[-3:]:
        c.output(w)
    bits = [int(v) for v in rng.integers(0, 2, 4)]
    expect = C.evaluate_plain(c, bits)

    msg = np.zeros(params.n, dtype=bool)
    msg[:4] = np.array(bits, dtype=bool)
    ct = F.encrypt(sk, jax.random.key(5), jnp.asarray(msg))
    lw = F.split_ciphertext(ct).lwe
    ebs = [F.EncryptedBit(F.LWE(lw.a[j], lw.b[j])) for j in range(4)]

    outs = C.evaluate(c, params, ctx, bkey, ebs)
    got = [int(np.asarray(F.decrypt_bit(sk, o))) for o in outs]
    assert got == expect
    # randomized flattening path
    outs_r = C.evaluate(c, params, ctx, bkey, ebs, flat_key=jax.random.key(9))
    got_r = [int(np.asarray(F.decrypt_bit(sk, o))) for o in outs_r]
    assert got_r == expect


@pytest.mark.parametrize("nbits", [1, 3])
def test_plain_oracle_subtractor_comparator_mux(nbits):
    sub = C.subtractor(nbits)
    cmp_ = C.comparator(nbits)
    m = C.mux(nbits)
    for a in range(1 << nbits):
        for b in range(1 << nbits):
            bits = [(a >> i) & 1 for i in range(nbits)] + [
                (b >> i) & 1 for i in range(nbits)
            ]
            out = C.evaluate_plain(sub, bits)
            diff = sum(v << i for i, v in enumerate(out[:nbits]))
            assert diff == (a - b) % (1 << nbits)
            assert out[nbits] == int(a >= b)
            ge, eq = C.evaluate_plain(cmp_, bits)
            assert ge == int(a >= b) and eq == int(a == b)
            for sel in (0, 1):
                got = C.evaluate_plain(m, [sel] + bits)
                want = a if sel else b
                assert sum(v << i for i, v in enumerate(got)) == want


def test_comparator_shares_subtractor_cost():
    """The >= flag costs the same bootstraps as the subtractor's carry chain
    (diff XORs pruned as dead gates); == rides the same XNORs + an AND tree."""
    nbits = 8
    assert C.comparator(nbits).num_bootstraps <= (
        C.subtractor(nbits).num_bootstraps + (nbits - 1)
    )


def test_subtractor_comparator_encrypted(setup64):
    params, ctx, sk, bkey = setup64
    nbits = 4
    sub = C.subtractor(nbits)
    cmp_ = C.comparator(nbits)
    rng = np.random.default_rng(9)
    pairs = [(int(rng.integers(0, 16)), int(rng.integers(0, 16)))
             for _ in range(4)]
    pairs[0] = (7, 7)  # force a tie
    rows = np.array([
        [(a >> i) & 1 for i in range(nbits)] + [(b >> i) & 1
                                                for i in range(nbits)]
        for a, b in pairs
    ])
    ebs = _encrypt_bits(params, sk, jax.random.key(12), rows)
    outs = C.evaluate(sub, params, ctx, bkey, ebs)
    dec = [np.asarray(F.decrypt_bit(sk, o)).astype(int) for o in outs]
    for j, (a, b) in enumerate(pairs):
        diff = sum(dec[i][j] << i for i in range(nbits))
        assert diff == (a - b) % (1 << nbits), (a, b)
        assert dec[nbits][j] == int(a >= b)
    outs = C.evaluate(cmp_, params, ctx, bkey, ebs)
    ge = np.asarray(F.decrypt_bit(sk, outs[0])).astype(int)
    eq = np.asarray(F.decrypt_bit(sk, outs[1])).astype(int)
    for j, (a, b) in enumerate(pairs):
        assert ge[j] == int(a >= b) and eq[j] == int(a == b)
