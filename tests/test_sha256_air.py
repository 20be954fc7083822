"""SHA-256 compression AIR: digest oracle vs hashlib, constraint
satisfaction on the real trace, and ZK prove+verify."""

import hashlib

import numpy as np

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.air import ExtAlgebra
from vectorx_tpu.stark.sha256_air import Sha256CompressAir

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))


def pad_single(msg: bytes) -> bytes:
    assert len(msg) <= 55
    return (msg + b"\x80" + b"\x00" * (55 - len(msg))
            + (len(msg) * 8).to_bytes(8, "big"))


def test_digest_matches_hashlib():
    for msg in (b"", b"abc", b"a" * 55, bytes(range(48))):
        air = Sha256CompressAir(pad_single(msg))
        got = b"".join(int.to_bytes(x, 4, "big") for x in air.digest)
        assert got == hashlib.sha256(msg).digest(), msg


def test_constraints_satisfied_on_trace():
    air = Sha256CompressAir(pad_single(b"vectorx"))
    tr = air.build_trace()
    cc = air.constant_columns()
    pub = air.public_inputs()
    rng = np.random.default_rng(0)
    rows = sorted({0, 15, 16, 40, 62, 63, 64, 100,
                   *(int(r) for r in rng.integers(0, 127, size=8))})
    for r in rows:
        local = [(int(tr[j, r]), 0) for j in range(tr.shape[0])]
        nxt = [(int(tr[j, r + 1]), 0) for j in range(tr.shape[0])]
        consts = [(int(cc[k, r]), 0) for k in range(cc.shape[0])]
        vals = air.transition(ExtAlgebra, local, nxt, pub, consts)
        assert all(v == (0, 0) for v in vals), f"row {r}"
    # boundaries consistent with the witness
    for (r, c, v) in air.boundaries(pub):
        assert int(tr[c, r]) == v


def test_sha256_zk_proof_roundtrip_and_tamper():
    air = Sha256CompressAir(pad_single(b"abc"))
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    bad = Sha256CompressAir(pad_single(b"abc"))
    bad.digests[0][0] ^= 1
    assert not verify(bad, proof, CFG)
    bad2 = Sha256CompressAir(pad_single(b"abd"))
    assert not verify(bad2, proof, CFG)


def test_multiblock_digest_matches_hashlib():
    from vectorx_tpu.stark.sha256_air import Sha256Air

    for msg in (b"", b"abc", b"x" * 64, b"y" * 100, bytes(range(150))):
        air = Sha256Air(msg)
        assert air.digest_bytes() == hashlib.sha256(msg).digest(), len(msg)


def test_statement_constructor_is_hash_free():
    from vectorx_tpu.stark.sha256_air import Sha256Air

    claimed = b"\xab" * 32
    air = Sha256Air.statement(b"hello world", claimed)
    assert air.digest_bytes() == claimed  # takes the claim verbatim
    # the claim lands in the preprocessed digest columns
    cc = air.constant_columns()
    drow = air.bases[0] + 65 * len(air.msg_blocks[0])
    from vectorx_tpu.stark.sha256_air import _CONST
    assert cc[_CONST["sel_digest"], drow] == 1
    assert [int(cc[_CONST[f"dig{i}"], drow]) for i in range(8)] == \
        [int.from_bytes(claimed[4 * i:4 * i + 4], "big") for i in range(8)]


def test_batched_multi_message_roundtrip():
    """Many independent messages in ONE trace (VERDICT round-2 item 3)."""
    from vectorx_tpu.stark.sha256_air import Sha256Air

    msgs = [b"abc", b"m" * 70, b"", bytes(range(64))]
    air = Sha256Air(msgs)
    exp = [hashlib.sha256(m).digest() for m in msgs]
    assert air.digest_bytes_list() == exp
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    stmt = Sha256Air.statement(msgs, exp)
    assert verify(stmt, proof, CFG)
    bad = exp.copy()
    bad[1] = b"\x00" * 32
    assert not verify(Sha256Air.statement(msgs, bad), proof, CFG)
    bad_msgs = list(msgs)
    bad_msgs[0] = b"abd"
    assert not verify(Sha256Air.statement(bad_msgs, exp), proof, CFG)


def test_zk_authority_commitment_single_key():
    from vectorx_tpu.circuits.zk_commitment import (
        prove_authority_commitment, verify_authority_commitment)
    from vectorx_tpu.hash.sha256 import chained_hash

    pubkeys = [b"\x05" * 32]
    proof = prove_authority_commitment(pubkeys, CFG)
    assert verify_authority_commitment(proof, CFG)
    assert proof.commitment == chained_hash(pubkeys)
    # wrong claimed digest
    proof.step_digests = [b"\x00" * 32]
    proof.commitment = b"\x00" * 32
    assert not verify_authority_commitment(proof, CFG)


def test_zk_merkle_root_two_leaves():
    from vectorx_tpu.circuits.zk_merkle import (prove_merkle_root,
                                                verify_merkle_root)
    from vectorx_tpu.merkle import sha256_merkle_root

    leaves = [b"\x01" * 32, b"\x02" * 32]
    proof = prove_merkle_root(leaves, CFG)
    assert verify_merkle_root(proof, CFG)
    # bit-exact with the reference commitment shape
    assert proof.root == sha256_merkle_root(leaves)
    # tampered root rejected
    proof.root = b"\x00" * 32
    assert not verify_merkle_root(proof, CFG)
