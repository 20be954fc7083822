"""ed25519 EdDSA ladder AIR: witness/oracle consistency on every row type
and a toy-scalar ZK round-trip with statement tamper rejection.

Full 253-bit single-signature proving is exercised by the driver-run
artifact (see README); the default suite uses 8-bit scalars, which walk
the identical row program (dec → ladder → dec → uadd → ladder → eq)."""

import numpy as np
import pytest

from vectorx_tpu.curves import ed25519 as ed
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.air import ExtAlgebra
from vectorx_tpu.stark.ed25519_ladder_air import Ed25519LadderAir

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))

Q = ed.Q


def _neg(p):
    return ((Q - p[0]) % Q, p[1], p[2], (Q - p[3]) % Q)


def make_instance(a_secret=12345, s_scalar=173, h_scalar=89):
    """A valid toy equation [S]B = R + [h]A with R derived to match."""
    A_pt = ed.scalar_mult(a_secret, ed.B_POINT)
    a_cmp = ed.point_compress(A_pt)
    sb = ed.scalar_mult(s_scalar, ed.B_POINT)
    ha = ed.scalar_mult(h_scalar, A_pt)
    r_pt = ed.point_add(sb, _neg(ha))
    r_cmp = ed.point_compress(r_pt)
    assert ed.point_decompress(a_cmp) is not None
    assert ed.point_decompress(r_cmp) is not None
    return (a_cmp, r_cmp, s_scalar, h_scalar)


def test_all_row_types_satisfy_constraints():
    sig = make_instance()
    air = Ed25519LadderAir([sig], nbits=8)
    tr = air.build_trace()
    cc = air.constant_columns()
    pub = air.public_inputs()
    # one row of every type plus a padding row
    sched = air._row_types()
    picks = {}
    for off, (ty, _b) in enumerate(sched):
        picks.setdefault(ty, off)
    # also a cadd row with bit=1 and one with bit=0
    h = sig[3]
    for off, (ty, b) in enumerate(sched):
        if ty == "cadd":
            picks[f"cadd_bit{(h >> b) & 1}"] = off
    rows = sorted(set(picks.values()) | {air.rows_per_sig,
                                         air.rows_per_sig + 3})
    for r in rows:
        local = [(int(tr[j, r]), 0) for j in range(tr.shape[0])]
        nxt = [(int(tr[j, r + 1]), 0) for j in range(tr.shape[0])]
        consts = [(int(cc[k, r]), 0) for k in range(cc.shape[0])]
        vals = air.transition(ExtAlgebra, local, nxt, pub, consts)
        bad = [i for i, v in enumerate(vals) if v != (0, 0)]
        assert not bad, f"row {r}: constraints {bad[:8]} nonzero"


def test_ladder_result_matches_host_scalar_mult():
    """The witness's final accumulator equals [S]B and saved = R + [h]A."""
    from vectorx_tpu.stark.ed25519_ladder_air import (COL_SX, COL_SZ,
                                                      COL_X1, COL_Z1)

    sig = make_instance(a_secret=777, s_scalar=201, h_scalar=45)
    air = Ed25519LadderAir([sig], nbits=8)
    tr = air.build_trace()
    eq_row = air.rows_per_sig - 1

    def reg(base, r):
        return sum(int(tr[base + u, r]) << (8 * u) for u in range(32))

    sb = ed.scalar_mult(sig[2], ed.B_POINT)
    x1, z1 = reg(COL_X1, eq_row), reg(COL_Z1, eq_row)
    assert (x1 * sb[2] - sb[0] * z1) % Q == 0
    r_pt = ed.point_decompress(sig[1])
    ha = ed.scalar_mult(sig[3], ed.point_decompress(sig[0]))
    acc3 = ed.point_add(r_pt, ha)
    sx, sz = reg(COL_SX, eq_row), reg(COL_SZ, eq_row)
    assert (sx * acc3[2] - acc3[0] * sz) % Q == 0


def test_wrong_equation_has_no_witness():
    sig = make_instance()
    bad = (sig[0], sig[1], sig[2] + 1, sig[3])   # S off by one
    air = Ed25519LadderAir([bad], nbits=8)
    with pytest.raises(AssertionError):
        air.build_trace()                         # eq payload can't be built


@pytest.mark.slow
def test_zk_roundtrip_and_statement_tamper():
    sig = make_instance()
    air = Ed25519LadderAir([sig], nbits=8)
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    stmt = Ed25519LadderAir.statement([sig], nbits=8)
    assert verify(stmt, proof, CFG)
    # forged scalar in the statement must fail
    forged = (sig[0], sig[1], (sig[2] ^ 1), sig[3])
    assert not verify(Ed25519LadderAir.statement([forged], nbits=8),
                      proof, CFG)
    # forged pubkey must fail
    other = ed.point_compress(ed.scalar_mult(999, ed.B_POINT))
    forged2 = (other, sig[1], sig[2], sig[3])
    assert not verify(Ed25519LadderAir.statement([forged2], nbits=8),
                      proof, CFG)
