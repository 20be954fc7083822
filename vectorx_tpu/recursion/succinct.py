"""Succinct composition: child proofs wired together INSIDE the machine,
so intermediate values never reach the final verifier.

First instance: a SHA-256 Merkle tree (the reference's data/state-root
commitment shape, /root/reference/circuits/input/mod.rs:464-489 and
subchain_verification.rs:212-274) proven as ONE machine proof whose public
surface is ONLY the leaves and the root — every interior digest is a
fresh internal tape value, bound by the level-childrens' transcripts on
both its producing and consuming side.  This is the composition primitive
the reference gets from plonky2x recursion (child proof outputs feeding
parent circuits as witnesses)."""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from vectorx_tpu.stark.prover import StarkConfig, preprocess, prove
from vectorx_tpu.stark.sha256_air import Sha256Air
from vectorx_tpu.stark.verifier import verify
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.shadow import verifier_tape
from vectorx_tpu.recursion.ssa import Affine, Builder

# padding block of a 64-byte message: 0x80, zeros, 512-bit length
_PAD64_WORDS = [0x80000000] + [0] * 14 + [512]


def _words(digest: bytes) -> list[int]:
    return [int.from_bytes(digest[4 * i:4 * i + 4], "big") for i in range(8)]


@dataclass
class ShaTreeProof:
    proof: object          # ONE machine StarkProof
    n_leaves: int


def _tree_levels(leaves: list[bytes]) -> list[list[bytes]]:
    levels = []
    cur = list(leaves)
    while len(cur) > 1:
        cur = [hashlib.sha256(cur[2 * i] + cur[2 * i + 1]).digest()
               for i in range(len(cur) // 2)]
        levels.append(cur)
    return levels


def _tree_tape(b: Builder, n_leaves: int, leaves, root, child_config,
               proofs, levels):
    """Shared tape: leaves + root are machine publics; interior digests
    are internal fresh values.  `leaves`/`root` are bytes (known to both
    sides — they are the statement); `levels`/`proofs` are prover-side
    (None for the verifier)."""
    assert n_leaves & (n_leaves - 1) == 0 and n_leaves >= 2
    pub_i = 0
    cur = []
    for leaf in leaves:
        hs = []
        for w in _words(leaf):
            hs.append(b.public(w, pub_i))
            pub_i += 1
        cur.append(hs)
    root_h = []
    for w in _words(root):
        root_h.append(b.public(w, pub_i))
        pub_i += 1

    lvl = 0
    while len(cur) > 1:
        n_nodes = len(cur) // 2
        air = Sha256Air.public_shape([2] * n_nodes)
        ph = [Affine(const=(n_nodes, 0))]
        outs = []
        for i in range(n_nodes):
            ph += cur[2 * i] + cur[2 * i + 1]           # block 1: the pair
            ph += [Affine(const=(w, 0)) for w in _PAD64_WORDS]
            if n_nodes == 1:
                dig = root_h                             # top binds the root
            else:
                vals = _words(levels[lvl][i]) if levels else [None] * 8
                dig = [b.fresh((v, 0) if v is not None else None,
                               f"t{lvl}.{i}.{j}") for j, v in enumerate(vals)]
            ph += dig
            outs.append(dig)
        pre = preprocess(air, child_config)
        verifier_tape(b, air, child_config,
                      proof=proofs[lvl] if proofs else None,
                      preprocessed=pre, public_handles=ph)
        cur = outs
        lvl += 1


def prove_sha_tree(leaves: list[bytes],
                   child_config: StarkConfig,
                   outer_config: StarkConfig | None = None) -> ShaTreeProof:
    """One machine proof that the SHA-256 Merkle tree over `leaves` has
    root `sha_tree_root(leaves)` — interior digests stay internal."""
    outer_config = outer_config or child_config
    levels = _tree_levels(leaves)
    root = levels[-1][0]
    # one public-bind child per level, all nodes of the level in one trace
    proofs = []
    cur = list(leaves)
    for lvl_digests in levels:
        msgs = [cur[2 * i] + cur[2 * i + 1] for i in range(len(cur) // 2)]
        air = Sha256Air(msgs, bind="public")
        assert air.digest_bytes_list() == lvl_digests
        proofs.append(prove(air, air.build_trace(), child_config))
        cur = lvl_digests
    bld = Builder(witness=True)
    _tree_tape(bld, len(leaves), leaves, root, child_config, proofs, levels)
    prog = compile_tape(bld)
    mair = MachineAir(prog)
    return ShaTreeProof(proof=prove(mair, mair.build_trace(), outer_config),
                        n_leaves=len(leaves))


def verify_sha_tree(leaves: list[bytes], root: bytes, tree: ShaTreeProof,
                    child_config: StarkConfig,
                    outer_config: StarkConfig | None = None) -> bool:
    """Check ONE machine proof against (leaves, root).  Interior digests
    are never seen — only their existence is proven."""
    outer_config = outer_config or child_config
    if tree.n_leaves != len(leaves):
        return False
    try:
        bld = Builder(witness=False)
        _tree_tape(bld, len(leaves), leaves, root, child_config,
                   None, None)
        mair = MachineAir(compile_tape(bld))
        return verify(mair, tree.proof, outer_config)
    except Exception:
        return False


def sha_tree_root(leaves: list[bytes]) -> bytes:
    return _tree_levels(leaves)[-1][0]
