"""Blake2b-256 AIR: digest oracle vs hashlib, constraint satisfaction on
the witness trace, ZK prove+verify (the Avail header-hash gadget)."""

import hashlib

import numpy as np

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.air import ExtAlgebra
from vectorx_tpu.stark.blake2b_air import Blake2bAir

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))


def test_digest_matches_hashlib():
    for msg in (b"", b"abc", b"x" * 128, b"y" * 129, bytes(range(250))):
        air = Blake2bAir(msg)
        exp = hashlib.blake2b(msg, digest_size=32).digest()
        assert air.digest_bytes() == exp, len(msg)


def test_constraints_satisfied_on_trace():
    msg = b"avail header " * 11  # 143 bytes -> 2 blocks
    air = Blake2bAir(msg)
    tr = air.build_trace()
    cc = air.constant_columns()
    pub = air.public_inputs()
    rng = np.random.default_rng(0)
    rows = sorted({0, 1, 23, 24, 25, 48, 49, 50,
                   *(int(r) for r in rng.integers(0, air.n - 1, size=6))})
    for r in rows:
        local = [(int(tr[j, r]), 0) for j in range(tr.shape[0])]
        nxt = [(int(tr[j, r + 1]), 0) for j in range(tr.shape[0])]
        consts = [(int(cc[k, r]), 0) for k in range(cc.shape[0])]
        vals = air.transition(ExtAlgebra, local, nxt, pub, consts)
        assert all(v == (0, 0) for v in vals), f"row {r}"
    for (r, c, v) in air.boundaries(pub):
        assert int(tr[c, r]) == v


def test_blake2b_zk_proof_roundtrip_and_tamper():
    msg = b"avail header bytes"
    air = Blake2bAir(msg)
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    # verifier-side statement with a forged digest must fail
    bad = Blake2bAir.statement(msg, b"\x00" * 32)
    assert not verify(bad, proof, CFG)
    # different message must fail
    bad2 = Blake2bAir(msg + b"!")
    assert not verify(bad2, proof, CFG)


def test_batched_multi_message_roundtrip():
    """Many independent messages in ONE trace (VERDICT round-2 item 3)."""
    msgs = [b"header one", b"x" * 130, b"", b"third message " * 9]
    air = Blake2bAir(msgs)
    exp = [hashlib.blake2b(m, digest_size=32).digest() for m in msgs]
    assert air.digest_bytes_list() == exp
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    # statement-side verification with the claimed digests
    stmt = Blake2bAir.statement(msgs, exp)
    assert verify(stmt, proof, CFG)
    # tampering any one digest in the batch must fail
    bad = exp.copy()
    bad[2] = b"\x00" * 32
    assert not verify(Blake2bAir.statement(msgs, bad), proof, CFG)
    # tampering any one message must fail
    bad_msgs = list(msgs)
    bad_msgs[1] = b"y" * 130
    assert not verify(Blake2bAir.statement(bad_msgs, exp), proof, CFG)


def test_zk_header_hash_on_fixture_chain():
    """C4 in ZK: prove blake2b(encoded header) = chain hash for a real
    synthetic-chain header (header.rs:13-20 semantics)."""
    from vectorx_tpu.io.fixtures import FixtureChain

    chain = FixtureChain(seed=17, num_blocks=8, epoch_length=4,
                         authorities_per_era=lambda e: 3)
    enc = chain.get_encoded_header(5)
    air = Blake2bAir(enc)
    assert air.digest_bytes() == chain.get_block_hash(5)
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    # a claimed wrong header hash must not verify
    bad = Blake2bAir.statement(enc, b"\x42" * 32)
    assert not verify(bad, proof, CFG)
