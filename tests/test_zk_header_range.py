"""header_range in ZK: component proofs + public wiring.

The full prove+verify round-trip takes ~5 minutes, so it is gated behind
VECTORX_SLOW_TESTS=1 (it is exercised in CI-equivalent driver runs via the
faster per-component tests in test_blake2b_air / test_sha256_air); the
cheap public-wiring rejection paths run unconditionally.
"""

import os

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
        header_hashes=hashes, header_proofs=[object(), object()],
        state_levels=[], state_proofs=[], data_levels=[], data_proofs=[],
        justification=CHAIN.get_justification(9, max_authorities=8))
    # garbage proof objects cannot verify
    assert not verify_header_range_zk(fake, tree_size=2, config=CFG)
    # structural mismatch: wrong header count
    fake2 = ZkHeaderRangeProof(
        input_bytes=inp, output_bytes=out, headers=headers[:1],
        header_hashes=hashes[:1], header_proofs=[object()],
        state_levels=[], state_proofs=[], data_levels=[], data_proofs=[],
        justification=fake.justification)
    assert not verify_header_range_zk(fake2, tree_size=2, config=CFG)


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS") != "1",
                    reason="~5 min; set VECTORX_SLOW_TESTS=1")
def test_zk_header_range_roundtrip():
    from vectorx_tpu.circuits import DummyHeaderRange

    inp = _input()
    proof = prove_header_range_zk(CHAIN, inp, tree_size=2,
                                  max_authorities=8, config=CFG)
    assert verify_header_range_zk(proof, tree_size=2, config=CFG)
    assert proof.output_bytes == DummyHeaderRange(2).run(inp, CHAIN)
    proof.header_hashes = list(proof.header_hashes)
    proof.header_hashes[0] = b"\x00" * 32
    assert not verify_header_range_zk(proof, tree_size=2, config=CFG)
