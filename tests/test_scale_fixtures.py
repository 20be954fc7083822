"""SCALE codec + synthetic fixture chain integrity tests."""

import hashlib

from vectorx_tpu import scale
from vectorx_tpu.curves import ed25519
from vectorx_tpu.hash.sha256 import chained_hash
from vectorx_tpu.io.fixtures import FixtureChain


def test_compact_boundary_cases():
    # Same boundary set as the reference decoder test (decoder.rs:238-249).
    cases = [(0, 0), (1, 0), (63, 0), (64, 1), (16383, 1), (16384, 2),
             (1073741823, 2), (1073741824, 3), (4294967295, 3)]
    for value, mode in cases:
        enc = scale.compact_encode(value)
        dec, m, consumed = scale.compact_decode(enc + b"\x00" * 4)
        assert (dec, m, consumed) == (value, mode, len(enc)), f"v={value}"


def test_precommit_roundtrip_and_reference_vector():
    # Hard-coded 53-byte vector from decoder.rs:388-396.
    encoded = bytes([
        1, 38, 27, 45, 113, 196, 242, 16, 36, 228, 137, 117, 93, 79, 157,
        136, 222, 239, 71, 241, 37, 152, 13, 194, 159, 190, 169, 38, 234,
        124, 89, 223, 233, 161, 217, 4, 0, 75, 58, 0, 0, 0, 0, 0, 0, 42, 1,
        0, 0, 0, 0, 0, 0])
    block_hash, block_number, round_, set_id = scale.decode_precommit(encoded)
    assert block_number == 317857
    assert set_id == 298
    assert scale.encode_precommit(block_hash, block_number, round_,
                                  set_id) == encoded


def test_header_roundtrip():
    hdr = scale.Header(
        parent_hash=b"\x01" * 32,
        block_number=123456,
        state_root=b"\x02" * 32,
        extrinsics_root=b"\x03" * 32,
        digest_logs=[scale.encode_other_log(b"abc"),
                     scale.encode_scheduled_change_log([b"\x05" * 32] * 3)],
        extension_filler=b"\x06" * 50,
        data_root=b"\x07" * 32,
    )
    enc = hdr.encode()
    back = scale.decode_header(enc)
    assert back.parent_hash == hdr.parent_hash
    assert back.block_number == hdr.block_number
    assert back.state_root == hdr.state_root
    assert back.digest_logs == hdr.digest_logs
    assert back.data_root == hdr.data_root
    assert back.encode() == enc
    # data root is the last 32 bytes (consts.rs DATA_ROOT_OFFSET_FROM_END)
    assert enc[-32:] == hdr.data_root


CHAIN = FixtureChain(seed=1, num_blocks=45, epoch_length=15,
                     authorities_per_era=lambda era: 4 + era)


def test_chain_hash_links():
    for n in range(1, 20):
        assert CHAIN.get_header(n).parent_hash == CHAIN.get_block_hash(n - 1)
        dec = scale.decode_header(CHAIN.get_encoded_header(n))
        assert dec.block_number == n


def test_set_id_semantics():
    assert CHAIN.get_authority_set_id(14) == 0
    assert CHAIN.get_authority_set_id(15) == 1
    assert CHAIN.last_justified_block(0) == 15
    assert CHAIN.last_justified_block(2) == 45
    assert CHAIN.last_justified_block(3) == 0  # era still open


def test_justification_verifies():
    j = CHAIN.get_justification(7, max_authorities=8)
    assert j.authority_set_id == 0
    assert sum(j.validator_signed) * 3 > j.num_authorities * 2
    for i in range(8):
        if j.validator_signed[i]:
            assert ed25519.verify(j.pubkeys[i], j.signed_message,
                                  j.signatures[i]), f"sig {i}"
    bh, bn, _, sid = scale.decode_precommit(j.signed_message)
    assert (bh, bn, sid) == (CHAIN.get_block_hash(7), 7, 0)


def test_epoch_end_justification_signed_by_old_set():
    j = CHAIN.get_justification(15)
    assert j.authority_set_id == 0
    assert j.pubkeys[:4] == CHAIN.era_pubkeys(0)


def test_rotate_witness_layout():
    rot = CHAIN.get_header_rotate(15, max_authorities=8)
    enc = CHAIN.get_encoded_header(15)
    pos = rot.start_position
    # one byte before the log; then variant 4 + FRNK (rotate.rs:74-94)
    assert enc[pos + 1] == 4
    assert enc[pos + 2:pos + 6] == b"FRNK"
    # walk the prefix exactly as verify_scheduled_change_message_length_and_flag
    cur = pos + 6
    _, mode, c = scale.compact_decode(enc[cur:cur + 5])
    cur += c
    assert enc[cur] == 1  # scheduled change flag
    cur += 1
    n_auth, _, c = scale.compact_decode(enc[cur:cur + 5])
    cur += c
    assert n_auth == rot.num_authorities == 5  # era 1 has 4+1 authorities
    # validators: pubkey(32) + weight 1u64 LE
    for i in range(n_auth):
        off = cur + i * 40
        assert enc[off:off + 32] == rot.padded_pubkeys[i]
        assert enc[off + 32:off + 40] == (1).to_bytes(8, "little")
    delay_off = cur + n_auth * 40
    assert enc[delay_off:delay_off + 4] == b"\x00" * 4
    assert rot.end_position == delay_off + 4
    assert rot.new_authority_set_hash == chained_hash(CHAIN.era_pubkeys(1))


def test_merkle_commitments_match_reference_shape():
    tree_size = 16
    state_c, data_c = CHAIN.get_merkle_root_commitments(tree_size, 10, 20)
    # recompute by hand: leaves blocks 11..20 padded to 16 with zeros
    leaves = [CHAIN.get_header(b).state_root for b in range(11, 21)]
    leaves += [b"\x00" * 32] * 6
    nodes = leaves
    while len(nodes) > 1:
        nodes = [hashlib.sha256(nodes[2 * i] + nodes[2 * i + 1]).digest()
                 for i in range(len(nodes) // 2)]
    assert state_c == nodes[0]
