"""header_range in ZK: batched component proofs + public wiring.

With multi-message AIR batching the tree=2 round-trip is two batched
proofs (one Blake2b trace for both headers, one SHA trace for both tree
roots), fast enough to run in the default suite (VERDICT round-2 item 7).
"""

import pytest

from vectorx_tpu.circuits.zk_header_range import (ZkHeaderRangeProof,
                                                  prove_header_range_zk,
                                                  verify_header_range_zk)
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.hash.sha256 import chained_hash
from vectorx_tpu.io.abi import HeaderRangeInput, HeaderRangeOutput
from vectorx_tpu.io.fixtures import FixtureChain
from vectorx_tpu.stark.prover import StarkConfig

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))
CHAIN = FixtureChain(seed=19, num_blocks=12, epoch_length=6,
                     authorities_per_era=lambda e: 4)


def _input(trusted=7, target=9, set_id=1):
    return HeaderRangeInput(trusted, CHAIN.get_block_hash(trusted), set_id,
                            chained_hash(CHAIN.era_pubkeys(set_id)),
                            target).encode()


def test_wiring_rejections_without_valid_proofs():
    inp = _input()
    headers = [CHAIN.get_encoded_header(8), CHAIN.get_encoded_header(9)]
    hashes = [CHAIN.get_block_hash(8), CHAIN.get_block_hash(9)]
    out = HeaderRangeOutput(hashes[-1], b"\x00" * 32, b"\x00" * 32).encode()
    fake = ZkHeaderRangeProof(
        input_bytes=inp, output_bytes=out, headers=headers,
        header_hashes=hashes, header_chunk_sizes=[2],
        header_proofs=[object()],
        state_levels=[], data_levels=[],
        sha_chunk_sizes=[], sha_proofs=[],
        justification=CHAIN.get_justification(9, max_authorities=8))
    # garbage proof objects cannot verify
    assert not verify_header_range_zk(fake, tree_size=2, config=CFG)
    # structural mismatch: wrong header count
    fake2 = ZkHeaderRangeProof(
        input_bytes=inp, output_bytes=out, headers=headers[:1],
        header_hashes=hashes[:1], header_chunk_sizes=[1],
        header_proofs=[object()],
        state_levels=[], data_levels=[],
        sha_chunk_sizes=[], sha_proofs=[],
        justification=fake.justification)
    assert not verify_header_range_zk(fake2, tree_size=2, config=CFG)


def test_zk_header_range_roundtrip():
    from vectorx_tpu.circuits import DummyHeaderRange

    inp = _input()
    proof = prove_header_range_zk(CHAIN, inp, tree_size=2,
                                  max_authorities=8, config=CFG)
    # batching: one Blake2b proof for both headers, one SHA proof for
    # both tree roots
    assert len(proof.header_proofs) == 1 and len(proof.sha_proofs) == 1
    assert verify_header_range_zk(proof, tree_size=2, config=CFG)
    assert proof.output_bytes == DummyHeaderRange(2).run(inp, CHAIN)
    proof.header_hashes = list(proof.header_hashes)
    proof.header_hashes[0] = b"\x00" * 32
    assert not verify_header_range_zk(proof, tree_size=2, config=CFG)


def test_zk_gateway_end_to_end_tamper_reverts():
    """VERDICT round-2 item 4: the proof object crosses the gateway
    boundary and is verified there; tampering the prover's output makes
    commitHeaderRange revert (the verifiedCall trust boundary,
    /root/reference/contracts/src/VectorX.sol:259-262)."""
    from vectorx_tpu.services import compute_genesis, make_gateway
    from vectorx_tpu.services.contract import ContractError, VectorXContract

    gw = make_gateway(CHAIN, max_authority_set_size=8, max_num_headers=2,
                      zk=True, stark_config=CFG)
    g = compute_genesis(CHAIN, 7)
    contract = VectorXContract(
        gw, g.height, g.header_hash, g.authority_set_id,
        g.authority_set_hash, header_range_commitment_tree_size=2)
    contract.request_header_range(g.authority_set_id, 9)
    gw.fulfill_next()
    assert contract.latest_block == 9
    assert contract.block_height_to_header_hash[9] == CHAIN.get_block_hash(9)

    # tampered prover output must be rejected at the gateway boundary
    fid = contract.header_range_function_id
    prover, verifier = gw.provers[fid]

    def evil(inp):
        out, zkp = prover(inp)
        bad = bytearray(out)
        bad[0] ^= 1
        return bytes(bad), zkp

    gw.register_prover(fid, evil, verifier)
    contract.request_header_range(g.authority_set_id, 11)
    with pytest.raises(ContractError):
        gw.fulfill_next()
    assert contract.latest_block == 9  # no state change happened
