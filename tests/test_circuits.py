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


def test_justification_rejects_tail_entries_beyond_authority_set():
    """ADVICE.md finding: attacker-keyed entries at indices >=
    num_authorities must not count toward the 2/3 threshold."""
    import dataclasses

    from vectorx_tpu.circuits.justification import (JustificationError,
                                                    verify_simple_justification)
    from vectorx_tpu.curves import ed25519

    j = CHAIN.get_justification(20)
    args = (20, CHAIN.get_block_hash(20), 0,
            chained_hash(CHAIN.era_pubkeys(0)))
    verify_simple_justification(j, *args)  # sanity: valid as fetched

    attacker = b"\x66" * 32
    bad = dataclasses.replace(
        j,
        validator_signed=list(j.validator_signed) + [True],
        pubkeys=list(j.pubkeys) + [ed25519.public_key(attacker)],
        signatures=list(j.signatures) + [ed25519.sign(attacker,
                                                      j.signed_message)])
    with pytest.raises(JustificationError):
        verify_simple_justification(bad, *args)

    # mismatched array lengths must also reject
    bad2 = dataclasses.replace(j, signatures=list(j.signatures) + [b"\x00" * 64])
    with pytest.raises(JustificationError):
        verify_simple_justification(bad2, *args)

    # num_authorities beyond the witness arrays must reject
    bad3 = dataclasses.replace(j, num_authorities=len(j.pubkeys) + 1)
    with pytest.raises(JustificationError):
        verify_simple_justification(bad3, *args)


def test_epoch_end_scan_bounded_by_header_size():
    """ADVICE.md finding: the consensus-log scan must not match bytes past
    header_size (only header_bytes[:header_size] is blake2b-attested)."""
    from vectorx_tpu.circuits.rotate import RotateError, verify_epoch_end_header

    rd = CHAIN.get_header_rotate(24, max_authorities=8,
                                 max_header_size=4096)
    verify_epoch_end_header(rd.header_bytes, rd.header_size,
                            rd.num_authorities, rd.start_position,
                            rd.padded_pubkeys, 8)  # sanity: valid

    # truncate the attested region to the middle of the validator list:
    # the scan would only succeed by reading unattested padding bytes
    cut = rd.start_position + 8
    with pytest.raises(RotateError):
        verify_epoch_end_header(rd.header_bytes, cut, rd.num_authorities,
                                rd.start_position, rd.padded_pubkeys, 8)

    # more authorities than the circuit bound must reject, not skip checks
    with pytest.raises(RotateError):
        verify_epoch_end_header(rd.header_bytes, rd.header_size,
                                rd.num_authorities, rd.start_position,
                                rd.padded_pubkeys,
                                max_authorities=rd.num_authorities - 1)


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
