"""ZK proof of the SHA-256 simple Merkle root — the data/state-root
commitment of the subchain map-reduce (C6) in zero knowledge.

The commitment tree is the reference's byte-level simple Merkle
(/root/reference/circuits/input/mod.rs:464-489 and the in-circuit
get_root_from_hashed_leaves + reduce-stage SHA256 parents,
subchain_verification.rs:212-274): leaves are NOT pre-hashed, interior
nodes are SHA256(left ‖ right).

Every interior node is one `Sha256Air` proof of a 64-byte message (two
blocks after padding); nodes are glued by PUBLIC wiring — a node's message
is the concatenation of its children's public digests — which the verifier
checks directly, never hashing anything itself.
"""

from __future__ import annotations

from dataclasses import dataclass

from vectorx_tpu.stark.prover import StarkConfig, prove
from vectorx_tpu.stark.sha256_air import Sha256Air
from vectorx_tpu.stark.verifier import verify


@dataclass
class MerkleRootProof:
    leaves: list            # public 32-byte leaves (power-of-two count)
    level_digests: list     # per level above the leaves: list of digests
    node_proofs: list       # flat, level-major left-to-right
    root: bytes


def prove_merkle_root(leaves: list[bytes],
                      config: StarkConfig = StarkConfig()
                      ) -> MerkleRootProof:
    n = len(leaves)
    assert n and n & (n - 1) == 0 and all(len(x) == 32 for x in leaves)
    level = list(leaves)
    level_digests = []
    proofs = []
    while len(level) > 1:
        nxt = []
        for i in range(len(level) // 2):
            air = Sha256Air(level[2 * i] + level[2 * i + 1])
            proofs.append(prove(air, air.build_trace(), config))
            nxt.append(air.digest_bytes())
        level_digests.append(nxt)
        level = nxt
    return MerkleRootProof(leaves=list(leaves), level_digests=level_digests,
                           node_proofs=proofs, root=level[0])


def verify_merkle_root(proof: MerkleRootProof,
                       config: StarkConfig = StarkConfig()) -> bool:
    n = len(proof.leaves)
    if n == 0 or n & (n - 1):
        return False
    if n == 1:
        return not proof.node_proofs and proof.root == proof.leaves[0]
    level = list(proof.leaves)
    idx = 0
    for digests in proof.level_digests:
        if len(digests) != len(level) // 2:
            return False
        for i, claimed in enumerate(digests):
            # statement: message = children (public wiring), digest = claim
            air = Sha256Air.statement(level[2 * i] + level[2 * i + 1],
                                      claimed)
            if idx >= len(proof.node_proofs) or \
                    not verify(air, proof.node_proofs[idx], config):
                return False
            idx += 1
        level = list(digests)
    return len(level) == 1 and level[0] == proof.root and \
        idx == len(proof.node_proofs)
