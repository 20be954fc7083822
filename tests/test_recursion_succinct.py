"""Succinct composition: wired publics hide intermediates.

The fast tests cover the wiring layer (public-bind Sha256Air + tape
wiring, statement/witness program equality).  The full machine prove of a
4-leaf tree takes ~15 min on CPU and is gated; a checked-in run log lives
at evidence/succinct_tree_run.log (prove+verify+tamper all green)."""

import os

import pytest

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.sha256_air import Sha256Air
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.ssa import Builder
from vectorx_tpu.recursion.succinct import (_tree_tape, _tree_levels,
                                            sha_tree_root)

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=2,
                                final_poly_len=2, pow_bits=1))
LEAVES = [bytes([i]) * 32 for i in range(4)]


def test_public_bind_sha_air_roundtrip():
    import hashlib

    msgs = [b"hello", b"B" * 70]
    air = Sha256Air(msgs, bind="public")
    assert air.digest_bytes_list() == [hashlib.sha256(m).digest()
                                       for m in msgs]
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    # a different claimed digest (public input) must reject
    bad = Sha256Air(msgs, bind="public")
    pubs = bad.public_inputs()
    pubs[-1] = (pubs[-1] + 1) % (1 << 32)
    bad.public_inputs = lambda: pubs
    assert not verify(bad, proof, CFG)


def test_tree_tape_structure_is_statement_only():
    """The verifier derives the identical machine program WITHOUT the
    interior digests — they are internal fresh values."""
    levels = _tree_levels(LEAVES)
    root = levels[-1][0]
    msgs_l0 = [LEAVES[0] + LEAVES[1], LEAVES[2] + LEAVES[3]]
    msgs_l1 = [levels[0][0] + levels[0][1]]
    proofs = []
    for msgs in (msgs_l0, msgs_l1):
        air = Sha256Air(msgs, bind="public")
        proofs.append(prove(air, air.build_trace(), CFG))
    bw = Builder(witness=True)
    _tree_tape(bw, 4, LEAVES, root, CFG, proofs, levels)
    bs = Builder(witness=False)
    _tree_tape(bs, 4, LEAVES, root, CFG, None, None)
    pw = compile_tape(bw)
    ps = compile_tape(bs)
    import numpy as np

    aw, as_ = MachineAir(pw), MachineAir(ps)
    assert np.array_equal(aw.constant_columns(), as_.constant_columns())
    # machine publics = leaf words + root words ONLY (no interiors)
    assert len(aw.public_inputs()) == 8 * len(LEAVES) + 8
    assert aw.public_inputs() == as_.public_inputs()


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS", "0") != "1",
                    reason="~15 min machine prove; see "
                           "evidence/succinct_tree_run.log")
def test_succinct_tree_full_roundtrip():
    from vectorx_tpu.recursion.succinct import (prove_sha_tree,
                                                verify_sha_tree)

    tp = prove_sha_tree(LEAVES, CFG)
    root = sha_tree_root(LEAVES)
    assert verify_sha_tree(LEAVES, root, tp, CFG)
    assert not verify_sha_tree(LEAVES, bytes(32), tp, CFG)
