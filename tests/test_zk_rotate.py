"""rotate in ZK: component proofs + public wiring (+ gated aggregation)."""

import os

import pytest

from vectorx_tpu.circuits.zk_rotate import (prove_rotate_zk,
                                            verify_rotate_zk)
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.hash.sha256 import chained_hash
from vectorx_tpu.io.abi import RotateInput, RotateOutput
from vectorx_tpu.io.fixtures import FixtureChain
from vectorx_tpu.stark.prover import StarkConfig

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))
CHAIN = FixtureChain(seed=19, num_blocks=12, epoch_length=6,
                     authorities_per_era=lambda e: 4)


def _input(set_id=1):
    return RotateInput(set_id,
                       chained_hash(CHAIN.era_pubkeys(set_id))).encode()


PROOF = prove_rotate_zk(CHAIN, _input(), max_authorities=8, config=CFG)


def test_zk_rotate_roundtrip():
    from vectorx_tpu.circuits import DummyRotate

    assert verify_rotate_zk(PROOF, max_authorities=8, config=CFG)
    # output matches the non-ZK dummy path byte-for-byte
    assert PROOF.output_bytes == DummyRotate().run(_input(), CHAIN)
    out = RotateOutput.decode(PROOF.output_bytes)
    assert out.new_authority_set_hash == chained_hash(CHAIN.era_pubkeys(2))


def test_zk_rotate_tamper_rejected():
    import copy

    # wrong claimed header hash: justification check must fail
    bad = copy.deepcopy(PROOF)
    bad.header_hash = b"\x00" * 32
    assert not verify_rotate_zk(bad, max_authorities=8, config=CFG)
    # tampered new-set commitment: output wiring must fail
    bad2 = copy.deepcopy(PROOF)
    bad2.output_bytes = b"\x11" * 32
    assert not verify_rotate_zk(bad2, max_authorities=8, config=CFG)
    # tampered header proof
    bad3 = copy.deepcopy(PROOF)
    bad3.header_proof.trace_at_zeta[0] = (
        (bad3.header_proof.trace_at_zeta[0][0] + 1) % (2**64 - 2**32 + 1),
        bad3.header_proof.trace_at_zeta[0][1])
    assert not verify_rotate_zk(bad3, max_authorities=8, config=CFG)
    # swapped-in pubkeys that do not match the scanned header bytes
    bad4 = copy.deepcopy(PROOF)
    bad4.commitment.pubkeys = list(bad4.commitment.pubkeys)
    bad4.commitment.pubkeys[0] = b"\x07" * 32
    assert not verify_rotate_zk(bad4, max_authorities=8, config=CFG)


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS", "0") != "1",
                    reason="machine aggregation prove is minutes-long; "
                           "see evidence/agg_header_range.json for the "
                           "aggregated pipeline evidence")
def test_zk_rotate_aggregated_roundtrip():
    from vectorx_tpu.circuits.zk_rotate import (aggregate_rotate_proof,
                                                verify_rotate_zk_aggregated)

    agg = aggregate_rotate_proof(PROOF, config=CFG)
    assert verify_rotate_zk_aggregated(agg, max_authorities=8, config=CFG)
    agg.header_hash = b"\x00" * 32
    assert not verify_rotate_zk_aggregated(agg, max_authorities=8,
                                           config=CFG)
