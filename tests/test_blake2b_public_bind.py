"""Blake2bAir bind="public": statement via boundaries + public inputs,
preprocessed columns carry only the shape — the header-hash gadget
becomes wirable inside the recursion aggregator (hidden header bytes)."""

import hashlib

import numpy as np

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.blake2b_air import Blake2bAir

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=2,
                                final_poly_len=2, pow_bits=1))
MSGS = [b"avail header bytes here", b"Z" * 150]
AIR = Blake2bAir(MSGS, bind="public")
PROOF = prove(AIR, AIR.build_trace(), CFG)


def test_public_bind_roundtrip():
    assert AIR.digest_bytes_list() == \
        [hashlib.blake2b(m, digest_size=32).digest() for m in MSGS]
    assert verify(AIR, PROOF, CFG)


def test_public_bind_rejects_wrong_publics():
    for idx in (1, -1):   # a message limb; a digest limb
        bad = Blake2bAir(MSGS, bind="public")
        pubs = bad.public_inputs()
        pubs[idx] = (pubs[idx] + 1) % (1 << 32)
        bad.public_inputs = lambda p=pubs: p
        assert not verify(bad, PROOF, CFG)


def test_public_shape_program_is_length_only():
    ps = Blake2bAir.public_shape([len(m) for m in MSGS])
    assert np.array_equal(ps.constant_columns(), AIR.constant_columns())
    assert len(ps.public_inputs()) == len(AIR.public_inputs())


def test_consts_bind_unchanged():
    air = Blake2bAir(MSGS)
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    # proofs are NOT interchangeable across binding modes
    assert not verify(air, PROOF, CFG)
