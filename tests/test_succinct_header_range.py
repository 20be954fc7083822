"""Succinct header_range: the verifier sees ONLY (input, output, proof).

Default tier drives the witness-mode tape (every constraint checked
eagerly, no machine prove): hash-chain + in-tape root extraction +
commitment trees, statement/witness program equality, and tamper
rejections.  The full machine prove round-trip (incl. the ed25519 ladder
and SHA-512 children) is slow-gated; a checked-in run lives under
evidence/."""

import hashlib
import os

import numpy as np
import pytest

from vectorx_tpu.circuits.succinct_header_range import (
    MAX_CHILD_ROWS, _ProofCursor, _blake_rows, _chain_section,
    _range_tape, _statement, _tree_section)
from vectorx_tpu.circuits.zk_commitment import chunk_by_rows
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.hash.sha256 import chained_hash
from vectorx_tpu.io.abi import HeaderRangeInput, HeaderRangeOutput
from vectorx_tpu.io.fixtures import FixtureChain
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.ssa import Affine, Builder, TapeCheckFailed
from vectorx_tpu.stark.blake2b_air import Blake2bAir
from vectorx_tpu.stark.prover import StarkConfig, prove
from vectorx_tpu.stark.sha256_air import Sha256Air

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=2,
                                final_poly_len=2, pow_bits=0))
CHAIN = FixtureChain(seed=19, num_blocks=12, epoch_length=6,
                     authorities_per_era=lambda e: 1)
TRUSTED, TARGET, SET_ID = 7, 9, 1
HEADERS = [CHAIN.get_encoded_header(8), CHAIN.get_encoded_header(9)]
INP = HeaderRangeInput(TRUSTED, CHAIN.get_block_hash(TRUSTED), SET_ID,
                       chained_hash(CHAIN.era_pubkeys(SET_ID)), TARGET)


def _roots(header, number):
    from vectorx_tpu import scale

    off = 32 + len(scale.compact_encode(number))
    return header[off:off + 32], header[len(header) - 32:]


def _out():
    state = [_roots(h, 8 + i)[0] for i, h in enumerate(HEADERS)]
    data = [_roots(h, 8 + i)[1] for i, h in enumerate(HEADERS)]
    sroot = hashlib.sha256(state[0] + state[1]).digest()
    droot = hashlib.sha256(data[0] + data[1]).digest()
    return HeaderRangeOutput(CHAIN.get_block_hash(TARGET), sroot, droot), \
        state, data


OUT, STATE_LEAVES, DATA_LEAVES = _out()


def _stmt():
    return {"inp": INP, "out": OUT, "header_lens": [len(h) for h in HEADERS],
            "tree_size": 2}


def _chain_proofs():
    proofs = []
    for csz in chunk_by_rows([len(h) for h in HEADERS], _blake_rows,
                             MAX_CHILD_ROWS):
        air = Blake2bAir(HEADERS[:csz], bind="public")
        proofs.append(prove(air, air.build_trace(), CFG))
    return proofs


def _tree_proofs():
    out = []
    for leaves in (STATE_LEAVES, DATA_LEAVES):
        air = Sha256Air([leaves[0] + leaves[1]], bind="public")
        out.append(prove(air, air.build_trace(), CFG))
    return out


CHAIN_PROOFS = _chain_proofs()
TREE_PROOFS = _tree_proofs()


def _limbs32(data):
    return [int.from_bytes(data[i:i + 4], "little")
            for i in range(0, len(data), 4)]


def _words_be(data):
    return [int.from_bytes(data[i:i + 4], "big")
            for i in range(0, len(data), 4)]


def _build_sections(witness: bool, out=None, inp=None):
    """Chain + both trees on one tape (the non-justification core of
    _range_tape), with real child proofs in witness mode."""
    out = out or OUT
    inp = inp or INP
    b = Builder(witness=witness)
    trusted_h = [b.public(v, i)
                 for i, v in enumerate(_limbs32(inp.trusted_header_hash))]
    final_h = [b.public(v, 8 + i)
               for i, v in enumerate(_limbs32(out.target_header_hash))]
    state_root_h = [b.public(v, 16 + i) for i, v in
                    enumerate(_words_be(out.state_root_commitment))]
    data_root_h = [b.public(v, 24 + i) for i, v in
                   enumerate(_words_be(out.data_root_commitment))]
    stmt = {"inp": inp, "header_lens": [len(h) for h in HEADERS]}
    cursor = _ProofCursor((CHAIN_PROOFS + TREE_PROOFS) if witness else None)
    headers = HEADERS if witness else None
    sw, dw = _chain_section(b, stmt, CFG, cursor, headers,
                            trusted_h, final_h)
    _tree_section(b, sw, 2, state_root_h, CFG, cursor,
                  STATE_LEAVES if witness else None, "st")
    _tree_section(b, dw, 2, data_root_h, CFG, cursor,
                  DATA_LEAVES if witness else None, "dt")
    return b


def test_extraction_tape_statement_witness_equal():
    bw = _build_sections(witness=True)
    bs = _build_sections(witness=False)
    aw = MachineAir(compile_tape(bw))
    as_ = MachineAir(compile_tape(bs))
    assert np.array_equal(aw.constant_columns(), as_.constant_columns())
    assert aw.public_inputs() == as_.public_inputs()
    assert len(aw.public_inputs()) == 32


def test_tampered_state_commitment_rejects():
    bad = HeaderRangeOutput(OUT.target_header_hash,
                            b"\x00" * 32, OUT.data_root_commitment)
    with pytest.raises((TapeCheckFailed, AssertionError)):
        _build_sections(witness=True, out=bad)


def test_wrong_block_number_pin_rejects():
    # trusted_block off by one: the pinned SCALE compact encoding no
    # longer matches the witnessed header bytes
    bad_inp = HeaderRangeInput(TRUSTED + 1, INP.trusted_header_hash,
                               SET_ID, INP.authority_set_hash, TARGET + 1)
    with pytest.raises((TapeCheckFailed, AssertionError)):
        _build_sections(witness=True, inp=bad_inp)


def test_wrong_trusted_hash_rejects():
    bad_inp = HeaderRangeInput(TRUSTED, b"\x11" * 32, SET_ID,
                               INP.authority_set_hash, TARGET)
    with pytest.raises((TapeCheckFailed, AssertionError)):
        _build_sections(witness=True, inp=bad_inp)


def test_statement_shape_validation():
    jf = {"signed_message": b"\x00" * 53, "pubkeys": [], "signatures": [],
          "validator_signed": [], "num_authorities": 0,
          "challenge_digests": []}
    with pytest.raises(ValueError):
        _statement(INP.encode(), OUT.encode(), [100], 2, jf)  # n=2, 1 len
    with pytest.raises(ValueError):
        _statement(INP.encode(), OUT.encode(), [100, 100], 3, jf)


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS", "0") != "1",
                    reason="full machine prove; see evidence/")
def test_succinct_header_range_full_roundtrip():
    import dataclasses

    from vectorx_tpu.circuits.succinct_header_range import (
        prove_header_range_succinct, verify_header_range_succinct)

    proof = prove_header_range_succinct(CHAIN, INP.encode(), tree_size=2,
                                        config=CFG)
    assert proof.output_bytes == OUT.encode()
    assert verify_header_range_succinct(proof, config=CFG)
    bad = bytearray(proof.output_bytes)
    bad[40] ^= 1
    p2 = dataclasses.replace(proof, output_bytes=bytes(bad))
    assert not verify_header_range_succinct(p2, config=CFG)
