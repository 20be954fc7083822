"""ZK proof of the GRANDPA authority-set commitment (C5's hash, in ZK).

The commitment is the chained hash
    SHA256( … SHA256( SHA256(k₀) ‖ k₁ ) … ‖ k_{n−1} )
(/root/reference/circuits/builder/justification.rs:127-162).  Each chain
step is a full SHA-256 proven by `Sha256Air`; the steps are glued by PUBLIC
wiring — step i's public digest must equal the first 32 bytes of step
i+1's public message — which the verifier checks directly (both values are
public inputs, so no in-circuit copy constraints are needed).

This is the first VectorX circuit component carried end-to-end into ZK on
this stack (SURVEY.md §7 layer 6).
"""

from __future__ import annotations

from dataclasses import dataclass

from vectorx_tpu.stark.prover import StarkConfig, prove
from vectorx_tpu.stark.sha256_air import Sha256Air
from vectorx_tpu.stark.verifier import verify


@dataclass
class AuthorityCommitmentProof:
    pubkeys: list          # the public statement
    step_digests: list     # claimed digest after each chain step (bytes)
    step_proofs: list      # one StarkProof per chain step
    commitment: bytes      # claimed final digest (== step_digests[-1])


def prove_authority_commitment(pubkeys: list[bytes],
                               config: StarkConfig = StarkConfig()
                               ) -> AuthorityCommitmentProof:
    assert pubkeys and all(len(pk) == 32 for pk in pubkeys)
    acc = b""
    proofs, digests = [], []
    for pk in pubkeys:
        air = Sha256Air(acc + pk)
        proofs.append(prove(air, air.build_trace(), config))
        acc = air.digest_bytes()
        digests.append(acc)
    return AuthorityCommitmentProof(pubkeys=list(pubkeys),
                                    step_digests=digests,
                                    step_proofs=proofs, commitment=acc)


def verify_authority_commitment(proof: AuthorityCommitmentProof,
                                config: StarkConfig = StarkConfig()) -> bool:
    """Check every step proof against its claimed statement and the public
    wiring between steps — the verifier never hashes anything itself."""
    if not (len(proof.step_proofs) == len(proof.pubkeys)
            == len(proof.step_digests)):
        return False
    acc = b""
    for pk, digest, step in zip(proof.pubkeys, proof.step_digests,
                                proof.step_proofs):
        # statement: message is the previous claimed digest ‖ pubkey (the
        # public wiring), digest is this step's claim
        air = Sha256Air.statement(acc + pk, digest)
        if not verify(air, step, config):
            return False
        acc = digest
    return acc == proof.commitment
