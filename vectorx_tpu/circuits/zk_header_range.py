"""header_range in zero knowledge — component proofs + public wiring.

The full reference header_range statement (C8: "blocks (trusted, target]
are hash-linked, their state/data roots commit to the published Merkle
roots, and the target is justified by the known authority set") carried
into ZK on this stack:

* one `Blake2bAir` proof per header: digest = Blake2b256(encoded header)
  — C4's gadget;
* `Sha256Air` proofs for every interior node of the state-root and
  data-root commitment trees — C6's commitments;
* the authority-set commitment chain via `zk_commitment` — C5's hash;
* GRANDPA signatures checked with the device-batched ed25519 verifier
  (`curves/ed25519_batch.py`) — sound verification, pending its own AIR.

The glue is PUBLIC wiring: header bytes, their claimed hashes, the
extracted state/data roots, and intermediate tree digests are all public,
so the verifier checks hash-linking, SCALE field extraction, and tree
structure directly on public data and checks one STARK proof per committed
hash.  (Succinctness — recursive aggregation into one proof — is the
round-2 ladder; soundness is complete here.)
"""

from __future__ import annotations

from dataclasses import dataclass

from vectorx_tpu.circuits.justification import verify_simple_justification
from vectorx_tpu.circuits.subchain import decode_header_fields
from vectorx_tpu.io.abi import HeaderRangeInput, HeaderRangeOutput
from vectorx_tpu.stark.blake2b_air import Blake2bAir
from vectorx_tpu.stark.prover import StarkConfig, prove
from vectorx_tpu.stark.sha256_air import Sha256Air
from vectorx_tpu.stark.verifier import verify


def _safe_verify(air, proof, config) -> bool:
    """Adversarial proof objects must reject, not raise."""
    try:
        return verify(air, proof, config)
    except Exception:
        return False


@dataclass
class ZkHeaderRangeProof:
    input_bytes: bytes
    output_bytes: bytes
    headers: list            # encoded header bytes (public witness data)
    header_hashes: list      # claimed Blake2b digests
    header_proofs: list      # Blake2bAir proofs, one per header
    state_levels: list       # per level: claimed digests (state tree)
    state_proofs: list       # Sha256Air proofs, level-major
    data_levels: list
    data_proofs: list
    justification: object    # JustificationData for the target block


def _tree_levels(leaves, config, proofs_out, prove_fn):
    level = list(leaves)
    levels = []
    while len(level) > 1:
        nxt = []
        for i in range(len(level) // 2):
            digest = prove_fn(level[2 * i] + level[2 * i + 1], proofs_out,
                              config)
            nxt.append(digest)
        levels.append(nxt)
        level = nxt
    return levels, level[0]


def prove_header_range_zk(fetcher, input_bytes: bytes, tree_size: int,
                          max_authorities: int = 300,
                          config: StarkConfig = StarkConfig()
                          ) -> ZkHeaderRangeProof:
    inp = HeaderRangeInput.decode(input_bytes)
    assert tree_size & (tree_size - 1) == 0
    assert inp.target_block - inp.trusted_block <= tree_size

    headers, hashes, header_proofs = [], [], []
    state_leaves, data_leaves = [], []
    for b in range(inp.trusted_block + 1, inp.target_block + 1):
        enc = fetcher.get_encoded_header(b)
        air = Blake2bAir(enc)
        header_proofs.append(prove(air, air.build_trace(), config))
        headers.append(enc)
        hashes.append(air.digest_bytes())
        d = decode_header_fields(enc, len(enc))
        state_leaves.append(d.state_root)
        data_leaves.append(d.data_root)
    pad = tree_size - len(state_leaves)
    state_leaves += [b"\x00" * 32] * pad
    data_leaves += [b"\x00" * 32] * pad

    def sha_step(message, proofs_out, cfg):
        air = Sha256Air(message)
        proofs_out.append(prove(air, air.build_trace(), cfg))
        return air.digest_bytes()

    state_proofs, data_proofs = [], []
    state_levels, state_root = _tree_levels(state_leaves, config,
                                            state_proofs, sha_step)
    data_levels, data_root = _tree_levels(data_leaves, config,
                                          data_proofs, sha_step)

    justification = fetcher.get_justification(
        inp.target_block, max_authorities=max_authorities)

    out = HeaderRangeOutput(
        target_header_hash=hashes[-1],
        state_root_commitment=state_root,
        data_root_commitment=data_root).encode()
    return ZkHeaderRangeProof(
        input_bytes=input_bytes, output_bytes=out,
        headers=headers, header_hashes=hashes,
        header_proofs=header_proofs,
        state_levels=state_levels, state_proofs=state_proofs,
        data_levels=data_levels, data_proofs=data_proofs,
        justification=justification)


def verify_header_range_zk(proof: ZkHeaderRangeProof, tree_size: int,
                           config: StarkConfig = StarkConfig()) -> bool:
    inp = HeaderRangeInput.decode(proof.input_bytes)
    out = HeaderRangeOutput.decode(proof.output_bytes)
    n = inp.target_block - inp.trusted_block
    if len(proof.headers) != n or len(proof.header_hashes) != n or \
            len(proof.header_proofs) != n:
        return False

    # 1. header-hash proofs + public hash-link / decode checks
    state_leaves, data_leaves = [], []
    prev_hash = inp.trusted_header_hash
    for i, (enc, claimed) in enumerate(zip(proof.headers,
                                           proof.header_hashes)):
        air = Blake2bAir.statement(enc, claimed)
        if not _safe_verify(air, proof.header_proofs[i], config):
            return False
        d = decode_header_fields(enc, len(enc))
        if d.parent_hash != prev_hash:
            return False
        if d.block_number != inp.trusted_block + 1 + i:
            return False
        prev_hash = claimed
        state_leaves.append(d.state_root)
        data_leaves.append(d.data_root)
    if proof.header_hashes[-1] != out.target_header_hash:
        return False
    pad = tree_size - len(state_leaves)
    state_leaves += [b"\x00" * 32] * pad
    data_leaves += [b"\x00" * 32] * pad

    # 2. commitment trees: per-node SHA proofs against public wiring
    def check_tree(leaves, levels, proofs, root):
        level = list(leaves)
        idx = 0
        for digests in levels:
            if len(digests) != len(level) // 2:
                return False
            for i, claimed in enumerate(digests):
                air = Sha256Air.statement(level[2 * i] + level[2 * i + 1],
                                          claimed)
                if idx >= len(proofs) or \
                        not _safe_verify(air, proofs[idx], config):
                    return False
                idx += 1
            level = list(digests)
        return len(level) == 1 and level[0] == root and idx == len(proofs)

    if not check_tree(state_leaves, proof.state_levels, proof.state_proofs,
                      out.state_root_commitment):
        return False
    if not check_tree(data_leaves, proof.data_levels, proof.data_proofs,
                      out.data_root_commitment):
        return False

    # 3. justification on the target header (device-batched ed25519)
    try:
        verify_simple_justification(
            proof.justification, inp.target_block, out.target_header_hash,
            inp.authority_set_id, inp.authority_set_hash,
            signature_backend="device")
    except Exception:
        return False
    return True
