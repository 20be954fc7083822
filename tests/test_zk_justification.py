"""GRANDPA justification in ZK: public-wiring rejection paths run in the
default suite; the full real-signature round-trip (253-bit ladders) is
gated as a slow test and exercised by the checked-in driver artifact
(evidence/zk_justification_run.log)."""

import os

import pytest

from vectorx_tpu.circuits.zk_justification import (ZkJustificationProof,
                                                   prove_justification_zk,
                                                   verify_justification_zk)
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.hash.sha256 import chained_hash
from vectorx_tpu.io.fixtures import FixtureChain
from vectorx_tpu.stark.prover import StarkConfig

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))
CHAIN = FixtureChain(seed=23, num_blocks=8, epoch_length=4,
                     authorities_per_era=lambda e: 1)


def _setup(block=3):
    j = CHAIN.get_justification(block)
    set_hash = chained_hash(CHAIN.era_pubkeys(j.authority_set_id))
    return j, set_hash


def test_wiring_rejections_without_valid_proofs():
    j, set_hash = _setup()
    from vectorx_tpu.circuits.zk_commitment import AuthorityCommitmentProof

    fake_commit = AuthorityCommitmentProof(
        pubkeys=list(j.pubkeys[:j.num_authorities]),
        step_digests=[set_hash], chunk_sizes=[1],
        step_proofs=[object()], commitment=set_hash)
    fake = ZkJustificationProof(
        signed_message=j.signed_message, pubkeys=list(j.pubkeys),
        signatures=list(j.signatures),
        validator_signed=list(j.validator_signed),
        num_authorities=j.num_authorities,
        challenge_digests=[b"\x00" * 64] * sum(j.validator_signed),
        commitment_proof=fake_commit,
        sha_chunk_sizes=[sum(j.validator_signed)], sha_proofs=[object()],
        ladder_chunk_sizes=[sum(j.validator_signed)],
        ladder_proofs=[object()])
    # garbage proof objects cannot verify
    assert not verify_justification_zk(fake, j.block_number, j.block_hash,
                                       j.authority_set_id, set_hash, CFG)
    # wrong block number
    assert not verify_justification_zk(fake, j.block_number + 1,
                                       j.block_hash, j.authority_set_id,
                                       set_hash, CFG)
    # threshold failure: no validators marked
    fake.validator_signed = [False] * len(fake.validator_signed)
    assert not verify_justification_zk(fake, j.block_number, j.block_hash,
                                       j.authority_set_id, set_hash, CFG)


def test_tail_entry_outside_set_rejected():
    j, set_hash = _setup()
    fake = ZkJustificationProof(
        signed_message=j.signed_message,
        pubkeys=list(j.pubkeys) + [b"\x01" * 32],
        signatures=list(j.signatures) + [b"\x02" * 64],
        validator_signed=list(j.validator_signed) + [True],
        num_authorities=j.num_authorities,
        challenge_digests=[], commitment_proof=None,
        sha_chunk_sizes=[], sha_proofs=[],
        ladder_chunk_sizes=[], ladder_proofs=[])
    assert not verify_justification_zk(fake, j.block_number, j.block_hash,
                                       j.authority_set_id, set_hash, CFG)


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS") != "1",
                    reason="253-bit ladder prove, ~15 min; see evidence/")
def test_zk_justification_roundtrip_real_signature():
    j, set_hash = _setup()
    proof = prove_justification_zk(j, set_hash, CFG)
    assert verify_justification_zk(proof, j.block_number, j.block_hash,
                                   j.authority_set_id, set_hash, CFG)
    # forged challenge digest must fail
    proof.challenge_digests = [b"\xff" * 64]
    assert not verify_justification_zk(proof, j.block_number, j.block_hash,
                                       j.authority_set_id, set_hash, CFG)
