"""End-to-end VectorX circuit semantics against the synthetic fixture chain:
header_range, rotate, dummy programs, ABI packing.

These mirror the reference's live-network integration tests
(header_range.rs:101-277, rotate.rs:164-277, subchain_verification.rs:450-484)
but run hermetically (SURVEY.md §4 implication).
"""

import pytest

from vectorx_tpu.circuits import (DummyHeaderRange, DummyRotate,
                                  HeaderRangeCircuit, RotateCircuit,
                                  SubchainError, verify_subchain)
from vectorx_tpu.hash.sha256 import chained_hash
from vectorx_tpu.io.abi import (HeaderRangeInput, HeaderRangeOutput,
                                RotateInput)
from vectorx_tpu.io.fixtures import FixtureChain

CHAIN = FixtureChain(seed=7, num_blocks=70, epoch_length=24,
                     authorities_per_era=lambda e: 5)


def hr_input(trusted, target, set_id):
    return HeaderRangeInput(
        trusted_block=trusted,
        trusted_header_hash=CHAIN.get_block_hash(trusted),
        authority_set_id=set_id,
        authority_set_hash=chained_hash(CHAIN.era_pubkeys(set_id)),
        target_block=target,
    ).encode()


def test_subchain_happy_path():
    out = verify_subchain(CHAIN, 3, CHAIN.get_block_hash(3), 20,
                          max_num_headers=32)
    assert out.target_header_hash == CHAIN.get_block_hash(20)
    state_c, data_c = CHAIN.get_merkle_root_commitments(32, 3, 20)
    assert out.state_root_merkle_root == state_c
    assert out.data_root_merkle_root == data_c


def test_subchain_rejects_wrong_trusted_hash():
    with pytest.raises(SubchainError):
        verify_subchain(CHAIN, 3, b"\x00" * 32, 20, max_num_headers=32)


def test_header_range_matches_dummy():
    """The ZK circuit outputs must equal the dummy program's outputs — the
    reference's golden-vector relationship (dummy_header_range.rs:61-76)."""
    circuit = HeaderRangeCircuit(max_authority_set_size=8,
                                 max_num_headers=32)
    inp = hr_input(5, 21, 0)
    out = circuit.run(inp, CHAIN)
    dummy_out = DummyHeaderRange(32).run(inp, CHAIN)
    assert out == dummy_out
    parsed = HeaderRangeOutput.decode(out)
    assert parsed.target_header_hash == CHAIN.get_block_hash(21)


def test_header_range_full_tree():
    # target - trusted == max_num_headers exactly (a full tree)
    circuit = HeaderRangeCircuit(max_authority_set_size=8,
                                 max_num_headers=16)
    out = circuit.run(hr_input(30, 46, 1), CHAIN)
    assert out == DummyHeaderRange(16).run(hr_input(30, 46, 1), CHAIN)


def test_header_range_epoch_end_target():
    # target block is the epoch-end block 24, signed by set 0
    circuit = HeaderRangeCircuit(max_authority_set_size=8,
                                 max_num_headers=16)
    out = circuit.run(hr_input(15, 24, 0), CHAIN)
    assert HeaderRangeOutput.decode(out).target_header_hash == \
        CHAIN.get_block_hash(24)


def test_header_range_rejects_wrong_set():
    circuit = HeaderRangeCircuit(max_authority_set_size=8,
                                 max_num_headers=16)
    bad = HeaderRangeInput(
        trusted_block=5,
        trusted_header_hash=CHAIN.get_block_hash(5),
        authority_set_id=1,  # wrong set for block 21
        authority_set_hash=chained_hash(CHAIN.era_pubkeys(1)),
        target_block=21,
    ).encode()
    with pytest.raises(Exception):
        circuit.run(bad, CHAIN)


def test_rotate_circuit_and_dummy_agree():
    circuit = RotateCircuit(max_authority_set_size=8)
    inp = RotateInput(
        authority_set_id=1,
        authority_set_hash=chained_hash(CHAIN.era_pubkeys(1)),
    ).encode()
    out = circuit.run(inp, CHAIN)
    assert out == DummyRotate().run(inp, CHAIN)
    assert out == chained_hash(CHAIN.era_pubkeys(2))


def test_rotate_rejects_wrong_current_hash():
    circuit = RotateCircuit(max_authority_set_size=8)
    inp = RotateInput(authority_set_id=1,
                      authority_set_hash=b"\x11" * 32).encode()
    with pytest.raises(Exception):
        circuit.run(inp, CHAIN)


def test_abi_golden_vector_shapes():
    """Parse the reference's checked-in dummy golden vector inputs
    (dummy_header_range.rs:66, dummy_rotate.rs:43) — offsets must match."""
    hr = bytes.fromhex(
        "0003c18695f303b01e4834da35e5fdc3971fe297d1b48feb0c3f330491639136"
        "a6ada5980000000000000075f2da06eb7ec36f683d2908648c431a1b3f968fa5"
        "212b72cc7e8eddce8b80958d0003c23a")
    inp = HeaderRangeInput.decode(hr)
    assert inp.trusted_block == 246150
    assert inp.authority_set_id == 117
    assert inp.target_block == 246330
    rot = bytes.fromhex(
        "0000000000000075f2da06eb7ec36f683d2908648c431a1b3f968fa5212b72cc"
        "7e8eddce8b80958d0003c6f0")
    rinp = RotateInput.decode(rot)
    assert rinp.authority_set_id == 117
    # round-trips (rotate golden vector carries a trailing u32 the program
    # ignores — compare the canonical 40-byte prefix)
    assert inp.encode() == hr
    assert rinp.encode() == rot[:40]
