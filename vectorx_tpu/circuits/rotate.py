"""Authority-set rotation verification (C7).

TPU-native equivalent of `RotateMethods`
(/root/reference/circuits/builder/rotate.rs:17-324): validates that an
epoch-end header is correctly signed by the current authority set and that
its ScheduledChange consensus log encodes exactly the claimed new authority
set, then returns the new set's chained-SHA256 commitment.

The byte-layout checks reproduce the circuit's walk exactly:
consensus-flag 0x04 + engine id "FRNK" (rotate.rs:74-94), compact
scheduled-change message length + 0x01 flag (:96-136), encoded authority
count equality (:138-167), and the per-validator pubkey/weight(=1u64
LE)/delay(=0) scan with end-of-set masking over the
MAX_SUBARRAY_SIZE window (:169-276).
"""

from __future__ import annotations

from vectorx_tpu import scale
from vectorx_tpu.circuits.justification import (
    compute_authority_set_commitment, verify_simple_justification)
from vectorx_tpu.hash.blake2b import blake2b_256
from vectorx_tpu.io.fixtures import HeaderRotateData, JustificationData

WEIGHT_BYTES = (1).to_bytes(8, "little")   # consts.rs:22-28, all weights = 1
DELAY_BYTES = b"\x00" * 4
VALIDATOR_LENGTH = 40


class RotateError(ValueError):
    pass


def verify_epoch_end_header(header_bytes: bytes, header_size: int,
                            num_authorities: int, start_position: int,
                            new_pubkeys: list[bytes],
                            max_authorities: int) -> None:
    """rotate.rs:169-276 — all checks on the encoded epoch-end header."""
    if num_authorities == 0:
        raise RotateError("num_authorities must be non-zero")

    sub = header_bytes[start_position:]
    # verify_consensus_log (rotate.rs:74-94): skip 1 byte, flag, engine id
    if sub[1] != 4:
        raise RotateError("missing consensus flag 0x04")
    if sub[2:6] != scale.CONSENSUS_ENGINE_ID:
        raise RotateError("missing FRNK engine id")

    # scheduled-change message length + flag (rotate.rs:96-136)
    cursor = 6
    _msg_len, mode, consumed = scale.compact_decode(sub[cursor:cursor + 5])
    cursor += consumed
    if sub[cursor] != 1:
        raise RotateError("missing ScheduledChange flag 0x01")
    cursor += 1

    # encoded authority count (rotate.rs:138-167)
    count, _mode, consumed = scale.compact_decode(sub[cursor:cursor + 5])
    if count != num_authorities:
        raise RotateError(
            f"encoded authority count {count} != hinted {num_authorities}")
    cursor += consumed

    # per-validator scan over the fixed window (rotate.rs:169-276)
    window = sub[cursor:]
    for i in range(min(max_authorities, num_authorities)):
        off = i * VALIDATOR_LENGTH
        pk = window[off:off + 32]
        if pk != new_pubkeys[i]:
            raise RotateError(f"pubkey mismatch for validator {i}")
        if window[off + 32:off + 40] != WEIGHT_BYTES:
            raise RotateError(f"weight != 1 for validator {i}")
    delay_off = num_authorities * VALIDATOR_LENGTH
    if window[delay_off:delay_off + 4] != DELAY_BYTES:
        raise RotateError("delay != 0")


def rotate(rotate_data: HeaderRotateData,
           justification: JustificationData,
           current_authority_set_id: int,
           current_authority_set_hash: bytes,
           epoch_end_block_number: int,
           max_authorities: int) -> bytes:
    """rotate.rs:278-324 — hash the epoch-end header, verify the current
    set's justification on it, validate the encoded new set, and return the
    new authority-set commitment."""
    target_header_hash = blake2b_256(
        rotate_data.header_bytes[:rotate_data.header_size])

    verify_simple_justification(
        justification, epoch_end_block_number, target_header_hash,
        current_authority_set_id, current_authority_set_hash)

    verify_epoch_end_header(
        rotate_data.header_bytes, rotate_data.header_size,
        rotate_data.num_authorities, rotate_data.start_position,
        rotate_data.padded_pubkeys, max_authorities)

    return compute_authority_set_commitment(
        rotate_data.num_authorities, rotate_data.padded_pubkeys)
