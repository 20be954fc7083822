"""ed25519 field-op AIR: witness correctness (fast) + one end-to-end
prove/verify (slow, gated like the other AIR suites)."""

import os

import numpy as np
import pytest

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.ed25519_air import FpMulAir, Q, mul_witness

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=12,
                                final_poly_len=4, pow_bits=0))
RNG = np.random.default_rng(13)


def _rand256():
    return int.from_bytes(RNG.bytes(32), "little")


def test_mul_witness_matches_bigint():
    for _ in range(25):
        a, b = _rand256(), _rand256()
        d, k, e = mul_witness(a, b)
        dv = sum(int(x) << (8 * i) for i, x in enumerate(d))
        kv = sum(int(x) << (8 * i) for i, x in enumerate(k))
        assert dv == (a * b) % Q
        assert a * b == kv * Q + dv
        assert np.all(e < 256)


def test_trace_satisfies_constraints_int_oracle():
    P = (1 << 64) - (1 << 32) + 1

    class IntAlg:
        add = staticmethod(lambda x, y: (x + y) % P)
        sub = staticmethod(lambda x, y: (x - y) % P)
        mul = staticmethod(lambda x, y: (x * y) % P)
        constant = staticmethod(lambda v: v % P)

    air = FpMulAir(9, [(_rand256(), _rand256()) for _ in range(3)])
    tr = air.build_trace()
    for r in (0, 2, 100, air.n - 2):
        local = [int(tr[c, r]) for c in range(air.width)]
        vals = air.transition(IntAlg, local, None, air.public_inputs())
        assert all(v == 0 for v in vals)


def test_squaring_chain_statement_and_constraints():
    """chain=True proves d_final = x^(2^(n-1)) mod q; the int oracle
    checks the selector-gated linkage constraints across row pairs."""
    P = (1 << 64) - (1 << 32) + 1

    class IntAlg:
        add = staticmethod(lambda u, v: (u + v) % P)
        sub = staticmethod(lambda u, v: (u - v) % P)
        mul = staticmethod(lambda u, v: (u * v) % P)
        constant = staticmethod(lambda v: v % P)

    x = _rand256() % Q
    air = FpMulAir(9, [(x, x)], chain=True)
    assert air.pub_final == pow(x, 1 << 511, Q)
    tr = air.build_trace()
    co = air.constant_columns()
    for r in (0, 17, air.n - 3):
        local = [int(tr[c, r]) for c in range(air.width)]
        nxt = [int(tr[c, r + 1]) for c in range(air.width)]
        consts = [int(co[k, r]) for k in range(co.shape[0])]
        vals = air.transition(IntAlg, local, nxt, air.public_inputs(),
                              consts)
        assert all(v == 0 for v in vals)


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS") != "1",
                    reason="multi-minute prove; set VECTORX_SLOW_TESTS=1")
def test_fpmul_roundtrip_and_tamper():
    muls = [(_rand256(), _rand256()) for _ in range(5)]
    air = FpMulAir(9, muls)
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    bad = FpMulAir(9, muls)
    bad.pub_d = (bad.pub_d + 1) % Q
    assert not verify(bad, proof, CFG)
