"""SHA-512 AIR: digest oracle vs hashlib, constraint satisfaction on the
witness trace, batched ZK round-trip (the EdDSA challenge-hash gadget)."""

import hashlib

import numpy as np

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.air import ExtAlgebra
from vectorx_tpu.stark.sha512_air import Sha512Air

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))


def test_digest_matches_hashlib():
    for msg in (b"", b"abc", b"x" * 111, b"y" * 112, b"z" * 117,
                bytes(range(200))):
        air = Sha512Air(msg)
        assert air.digest_bytes() == hashlib.sha512(msg).digest(), len(msg)


def test_constraints_satisfied_on_trace():
    # 117 bytes = the EdDSA challenge message shape (R ‖ A ‖ 53-byte M)
    msg = bytes(range(117))
    air = Sha512Air(msg)
    tr = air.build_trace()
    cc = air.constant_columns()
    pub = air.public_inputs()
    rng = np.random.default_rng(0)
    rows = sorted({0, 15, 16, 79, 80, 81, 96, 161, 162,
                   *(int(r) for r in rng.integers(0, air.n - 1, size=6))})
    for r in rows:
        local = [(int(tr[j, r]), 0) for j in range(tr.shape[0])]
        nxt = [(int(tr[j, r + 1]), 0) for j in range(tr.shape[0])]
        consts = [(int(cc[k, r]), 0) for k in range(cc.shape[0])]
        vals = air.transition(ExtAlgebra, local, nxt, pub, consts)
        bad = [i for i, v in enumerate(vals) if v != (0, 0)]
        assert not bad, f"row {r}: constraints {bad[:8]} nonzero"


def test_batched_zk_roundtrip_and_tamper():
    msgs = [b"challenge one", bytes(range(117))]
    air = Sha512Air(msgs)
    exp = [hashlib.sha512(m).digest() for m in msgs]
    assert air.digest_bytes_list() == exp
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    stmt = Sha512Air.statement(msgs, exp)
    assert verify(stmt, proof, CFG)
    bad = exp.copy()
    bad[1] = b"\x00" * 64
    assert not verify(Sha512Air.statement(msgs, bad), proof, CFG)
    bad_msgs = list(msgs)
    bad_msgs[0] = b"challenge two"
    assert not verify(Sha512Air.statement(bad_msgs, exp), proof, CFG)
