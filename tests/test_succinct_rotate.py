"""Succinct rotate: witness-mode byte walk over HIDDEN header limbs.

Default tier drives the tape eagerly (every constraint checked at build
time, no machine prove): the Blake2b header child with the in-tape
consensus-log walk, both commitment chains, statement/witness program
equality, and tamper rejections on every pinned surface.  The full
machine round-trip (incl. justification children) is slow-gated."""

import hashlib
import os

import numpy as np
import pytest

from vectorx_tpu import scale
from vectorx_tpu.circuits.succinct_rotate import (_commitment_section,
                                                  _header_section,
                                                  _ProofCursor, _statement)
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.hash.sha256 import chained_hash
from vectorx_tpu.io.abi import RotateInput, RotateOutput
from vectorx_tpu.io.fixtures import FixtureChain
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.ssa import Builder, TapeCheckFailed
from vectorx_tpu.stark.blake2b_air import Blake2bAir
from vectorx_tpu.stark.prover import StarkConfig, prove
from vectorx_tpu.stark.sha256_air import Sha256Air

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=2,
                                final_poly_len=2, pow_bits=0))
CHAIN = FixtureChain(seed=23, num_blocks=12, epoch_length=6,
                     authorities_per_era=lambda e: 1)
SET_ID = 1
INP = RotateInput(SET_ID, chained_hash(CHAIN.era_pubkeys(SET_ID)))
EPOCH_END = CHAIN.last_justified_block(SET_ID)
RD = CHAIN.get_header_rotate(EPOCH_END)
HEADER = RD.header_bytes[:RD.header_size]
HEADER_HASH = hashlib.blake2b(HEADER, digest_size=32).digest()
NEW_PUBKEYS = list(RD.padded_pubkeys[:RD.num_authorities])
OUT = RotateOutput(new_authority_set_hash=RD.new_authority_set_hash)
CONSUMED = scale.compact_decode(
    HEADER[RD.start_position + 6:RD.start_position + 11])[2]


def _meta(**over):
    m = {"epoch_end_block": EPOCH_END, "header_len": len(HEADER),
         "start_position": RD.start_position,
         "len_prefix_consumed": CONSUMED,
         "num_authorities": RD.num_authorities,
         "new_pubkeys": NEW_PUBKEYS,
         "signed_message": scale.encode_precommit(
             HEADER_HASH, EPOCH_END, 1, SET_ID),
         "pubkeys": CHAIN.era_pubkeys(SET_ID), "signatures": [],
         "validator_signed": [], "just_num_authorities": 1,
         "challenge_digests": []}
    m.update(over)
    return m


def _child_proofs():
    proofs = []
    air = Blake2bAir([HEADER], bind="public")
    proofs.append(prove(air, air.build_trace(), CFG))
    for pks in (CHAIN.era_pubkeys(SET_ID), NEW_PUBKEYS):
        acc = b""
        for pk in pks:
            cair = Sha256Air([acc + pk], bind="public")
            proofs.append(prove(cair, cair.build_trace(), CFG))
            acc = hashlib.sha256(acc + pk).digest()
    return proofs


PROOFS = _child_proofs()


def _words_be(data):
    return [int.from_bytes(data[i:i + 4], "big")
            for i in range(0, len(data), 4)]


def _build_core(witness: bool, meta=None, inp=None, out=None):
    """Header section + both commitment chains (the non-justification
    core of _rotate_tape), with real child proofs in witness mode."""
    meta = meta or _meta()
    inp = inp or INP
    out = out or OUT
    stmt = _statement(inp.encode(), out.encode(), meta)
    b = Builder(witness=witness)
    auth_h = [b.public(v, i)
              for i, v in enumerate(_words_be(inp.authority_set_hash))]
    new_h = [b.public(v, 8 + i) for i, v in
             enumerate(_words_be(out.new_authority_set_hash))]
    cursor = _ProofCursor(PROOFS if witness else None)
    header = HEADER if witness else None
    bh = scale.decode_precommit(stmt["signed_message"])[0]
    _header_section(b, stmt, CFG, cursor, header, bh)
    _commitment_section(b, stmt["pubkeys"][:1], auth_h, CFG, cursor,
                        witness=witness)
    _commitment_section(b, stmt["new_pubkeys"], new_h, CFG, cursor,
                        witness=witness)
    return b


def test_statement_witness_programs_equal():
    bw = _build_core(witness=True)
    bs = _build_core(witness=False)
    aw = MachineAir(compile_tape(bw))
    as_ = MachineAir(compile_tape(bs))
    assert np.array_equal(aw.constant_columns(), as_.constant_columns())
    assert aw.public_inputs() == as_.public_inputs()
    assert len(aw.public_inputs()) == 16


def test_walk_pins_match_real_header():
    # sanity: the fixture's epoch-end header really carries the log
    start = RD.start_position
    assert HEADER[start + 1] == 4
    assert HEADER[start + 2:start + 6] == scale.CONSENSUS_ENGINE_ID
    _build_core(witness=True)        # every pin checked eagerly


def test_wrong_new_pubkey_rejects():
    bad = list(NEW_PUBKEYS)
    bad[0] = b"\x07" * 32
    # commitment for the tampered set (so the chain itself is consistent)
    out = RotateOutput(new_authority_set_hash=chained_hash(bad))
    with pytest.raises((TapeCheckFailed, AssertionError, Exception)):
        _build_core(witness=True, meta=_meta(new_pubkeys=bad), out=out)


def test_wrong_start_position_rejects():
    with pytest.raises((TapeCheckFailed, ValueError, AssertionError)):
        _build_core(witness=True,
                    meta=_meta(start_position=RD.start_position + 1))


def test_tampered_output_hash_rejects():
    out = RotateOutput(new_authority_set_hash=b"\x13" * 32)
    with pytest.raises((TapeCheckFailed, AssertionError)):
        _build_core(witness=True, out=out)


def test_wrong_authority_count_rejects():
    """Claimed count 2 but the header encodes 1: the pinned
    compact_encode(count) byte no longer matches the witness."""
    bad_keys = NEW_PUBKEYS + [b"\x09" * 32]
    out = RotateOutput(new_authority_set_hash=chained_hash(bad_keys))
    with pytest.raises((TapeCheckFailed, ValueError, AssertionError)):
        _build_core(witness=True,
                    meta=_meta(num_authorities=2, new_pubkeys=bad_keys),
                    out=out)


def test_statement_validation():
    with pytest.raises(ValueError):
        _statement(INP.encode(), OUT.encode(),
                   _meta(len_prefix_consumed=3))
    with pytest.raises(ValueError):
        _statement(INP.encode(), OUT.encode(),
                   _meta(start_position=len(HEADER)))
    with pytest.raises(ValueError):
        _statement(INP.encode(), OUT.encode(), _meta(num_authorities=0))
    with pytest.raises(ValueError):
        # window extends past the hashed region
        _statement(INP.encode(), OUT.encode(),
                   _meta(header_len=RD.start_position + 20))


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS", "0") != "1",
                    reason="full machine prove; see evidence/")
def test_succinct_rotate_full_roundtrip():
    import dataclasses

    from vectorx_tpu.circuits.succinct_rotate import (
        prove_rotate_succinct, verify_rotate_succinct)

    proof = prove_rotate_succinct(CHAIN, INP.encode(), max_authorities=8,
                                  config=CFG)
    assert proof.output_bytes == OUT.encode()
    assert verify_rotate_succinct(proof, max_authorities=8, config=CFG)
    bad = dataclasses.replace(proof, output_bytes=b"\x11" * 32)
    assert not verify_rotate_succinct(bad, max_authorities=8, config=CFG)
    bad2 = dataclasses.replace(
        proof, input_bytes=RotateInput(SET_ID, b"\x22" * 32).encode())
    assert not verify_rotate_succinct(bad2, max_authorities=8, config=CFG)
