"""Proof aggregation: N child STARK verifications in ONE machine proof.

The TPU-native equivalent of the reference's reduce tree — where plonky2x
recursively verifies two child proofs per reduce node across a log-depth
tree of separate proofs
(/root/reference/circuits/builder/subchain_verification.rs:233-289), here
every child verification is replayed onto one shared tape (shadow.py) and
the whole tape is proven as one verifier-VM STARK (machine.py).  One
aggregation proof replaces the pile of component proofs.

Binding: each child's statement enters the tape through its public inputs
(exposed as machine publics at a per-child offset) and through its
preprocessed-columns cap (derived from the child AIR, burned into the
machine program as constants).  The aggregate verifier re-derives the
machine program from the claimed child statements alone, so a proof for
different statements has a different program commitment and cannot
verify.
"""

from __future__ import annotations

from dataclasses import dataclass

from vectorx_tpu.stark.prover import StarkConfig, prove
from vectorx_tpu.stark.verifier import verify
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.shadow import verifier_tape
from vectorx_tpu.recursion.ssa import Builder, TapeCheckFailed


@dataclass
class AggregationResult:
    machine_air: MachineAir
    proof: object                 # the single outer StarkProof
    public_offsets: list          # child i's publics start here


def _build_tape(children, child_config, proofs=None):
    """One tape verifying every child; returns (builder, offsets).
    `proofs=None` builds the statement tape (program only)."""
    b = Builder(witness=proofs is not None)
    offsets = []
    off = 0
    for i, air in enumerate(children):
        offsets.append(off)
        # the child's constants cap comes from the content-addressed VK
        # cache inside verifier_tape (stark/vk.py) — never recomputed per
        # verify once a shape has been seen
        off += verifier_tape(
            b, air, child_config,
            proof=proofs[i] if proofs is not None else None,
            public_offset=off)
    return b, offsets


def aggregate_prove(children, proofs, child_config: StarkConfig,
                    outer_config: StarkConfig | None = None
                    ) -> AggregationResult:
    """Prove "child proof i verifies against statement i" for all i, as
    one machine STARK.  Raises TapeCheckFailed if any child proof is
    invalid (the tape rejects exactly what the host verifier rejects)."""
    outer_config = outer_config or child_config
    b, offsets = _build_tape(children, child_config, proofs=proofs)
    prog = compile_tape(b)
    air = MachineAir(prog)
    proof = prove(air, air.build_trace(), outer_config)
    return AggregationResult(machine_air=air, proof=proof,
                             public_offsets=offsets)


def aggregate_verify(children, agg_proof, child_config: StarkConfig,
                     outer_config: StarkConfig | None = None) -> bool:
    """Verify ONE machine proof against the claimed child statements.

    Touches no child proof data: the machine program is re-derived from
    the statements, and the outer STARK is checked against it."""
    outer_config = outer_config or child_config
    try:
        b, _ = _build_tape(children, child_config, proofs=None)
        prog = compile_tape(b)
        air = MachineAir(prog)
    except Exception:
        return False
    try:
        return verify(air, agg_proof, outer_config)
    except Exception:
        return False
