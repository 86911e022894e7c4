"""Scheme-1 parameters (reference: src/fhe.jl:27-99 `Params`).

Derivations mirror the reference exactly for n, r, q, t, m, Dr, Dq:

    r  = 16 n                      (power of two -> Z_r arithmetic is masking)
    q  = find_modulus(2n, r*n)     (NTT-friendly prime for length-n rings)
    t  = log2(r) - 1,  m = r / 2
    Dr = r/4,  Dq = q/4,  DQ~ = Q/8

The one deliberate TPU-native redesign is the big modulus: the reference picks
a single prime Q in [1220 r^4 n^2, 1225 r^4 n^2] (src/fhe.jl:64-69) and a
gadget base B = 35 r^2 n with l=2 digits (src/fhe.jl:87, B^2 >= Q). We pick
**Q as a product of L NTT-friendly primes < 2^29 in the same interval** and
use the balanced mixed-radix gadget over those primes (l = L digits, weights
w_i = prod_{j<i} p_j). This keeps every device op in uint32 lanes — the design
the reference itself validates in scheme 2 (src/fhe2.jl:57-60, Q = B*Bp with
the decomposition base an RNS modulus). Digit bounds p_i/2 < B/2 mean the
noise analysis of eprint 2018/637 holds with margin (smaller digits -> less
noise per external product; Q >= 1220 r^4 n^2 unchanged).

`Params` is a frozen, hashable dataclass of Python ints — it is the static
argument of every jitted function, exactly the "one frozen config object"
called for in SURVEY.md §5.
"""

from __future__ import annotations

import dataclasses
import math

from ..utils import primes as pr


def _num_limbs(qmax: int, limit_bits: int = 29) -> int:
    bits = qmax.bit_length()
    return max(2, math.ceil(bits / limit_bits))


@dataclasses.dataclass(frozen=True)
class Params:
    n: int
    r: int
    q: int
    t: int
    m: int
    moduli: tuple[int, ...]  # RNS primes, product = Q
    Dr: int
    Dq: int

    @classmethod
    def create(cls, n: int, num_limbs: int | None = None) -> "Params":
        """Build parameters for polynomial length n (power of two, >= 64).

        `num_limbs` overrides the RNS limb count (the analog of the
        reference's `rlwe_type` width knob, src/fhe.jl:71-81).
        """
        assert n >= 64, "n must be >= 64"
        assert n & (n - 1) == 0, "n must be a power of 2"
        r = 16 * n
        q = pr.find_modulus(2 * n, r * n)
        # q must fit a single uint32 NTT modulus (q ~ 16 n^2): holds through
        # n = 4096 (reference covers the same sizes via its UInt128
        # `rlwe_type` knob, src/fhe.jl:71-81; perf tests run Params(1024),
        # test/performance.test.jl:54-78)
        assert q < (1 << 30), f"n={n}: q ~ 16n^2 exceeds the uint32 NTT range"
        t = r.bit_length() - 1 - 1  # log2(r) - 1
        m = r // 2
        qmin = 1220 * r**4 * n**2
        qmax = 1225 * r**4 * n**2
        count = num_limbs if num_limbs is not None else _num_limbs(qmax)
        moduli = pr.find_rns_primes(2 * m, qmin, qmax, count)
        return cls(
            n=n, r=r, q=q, t=t, m=m, moduli=moduli, Dr=r // 4, Dq=q // 4
        )

    @property
    def Q(self) -> int:
        prod = 1
        for p in self.moduli:
            prod *= p
        return prod

    @property
    def DQ_tilde(self) -> int:
        return self.Q // 8

    @property
    def num_limbs(self) -> int:
        return len(self.moduli)

    @property
    def num_digits(self) -> int:
        """Gadget decomposition length l (reference hardcodes 2,
        src/fhe.jl:119-122; ours equals the limb count)."""
        return len(self.moduli)

    @property
    def gadget_weights(self) -> tuple[int, ...]:
        """w_i = prod_{j<i} p_j — the generalization of (1, B)."""
        out = []
        w = 1
        for p in self.moduli:
            out.append(w)
            w *= p
        return tuple(out)

    @property
    def mask_r(self) -> int:
        return self.r - 1
