"""A REAL STARK proof through the sharded path, with checkpointing.

The reference distributes whole leaf proofs across platform workers
(/root/reference/circuits/builder/subchain_verification.rs:78-290 via the
closed Succinct platform); the TPU-native equivalent shards the heavy
stages of ONE prove over the device mesh: the (W, n) trace limb arrays are
placed with a `NamedSharding` over the DOMAIN axis and every downstream
stage — iNTT/coset-LDE, the Poseidon Merkle build, constraint composition,
quotient, DEEP, FRI folds — runs GSPMD-partitioned, with XLA inserting the
all-gathers/collective-permutes the butterflies and tree reductions need
(the "annotate shardings, let XLA insert collectives" recipe).  The
Fiat-Shamir transcript stays on host and is bit-identical to the unsharded
run, so `verify()` accepts the proof unchanged.

Checkpointing composes with `parallel.scheduler.CheckpointStore`: a
finished proof is serialized into the store under its job key, and a
resumed job returns it without re-proving (the per-stage resume discipline
the reference lacks — SURVEY.md §5 "Proof jobs are not resumable")."""

from __future__ import annotations

import dataclasses

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vectorx_tpu.fri.fri import FriProof, FriQueryRound, FriQueryStep
from vectorx_tpu.stark.prover import (StarkConfig, StarkProof, TreeOpening,
                                      prove)

_CLASSES = {c.__name__: c for c in
            (StarkProof, TreeOpening, FriProof, FriQueryRound, FriQueryStep)}


def proof_to_json(obj):
    """StarkProof -> JSON-able dict (ints/lists/tuples/dataclasses only)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return {"__class__": type(obj).__name__,
                "fields": {f.name: proof_to_json(getattr(obj, f.name))
                           for f in dataclasses.fields(obj)}}
    if isinstance(obj, tuple):
        return {"__tuple__": [proof_to_json(v) for v in obj]}
    if isinstance(obj, list):
        return [proof_to_json(v) for v in obj]
    if isinstance(obj, (int, str, type(None))):
        return obj
    return int(obj)          # numpy scalar


def proof_from_json(data):
    if isinstance(data, dict) and "__class__" in data:
        cls = _CLASSES[data["__class__"]]
        return cls(**{k: proof_from_json(v)
                      for k, v in data["fields"].items()})
    if isinstance(data, dict) and "__tuple__" in data:
        return tuple(proof_from_json(v) for v in data["__tuple__"])
    if isinstance(data, list):
        return [proof_from_json(v) for v in data]
    return data


def prove_sharded(air, trace_u64, config: StarkConfig, mesh: Mesh,
                  axis: str = "batch", store=None,
                  job: str = "sharded-prove"):
    """Prove `air` with its domain axis sharded over `mesh`.

    Returns (proof, from_checkpoint).  With a `CheckpointStore`, a
    completed proof is persisted under (`job`, "proof") and reused."""
    if store is not None:
        cached = store.get(job, "proof")
        if cached is not None:
            return proof_from_json(cached["proof"]), True
    sharding = NamedSharding(mesh, P(None, axis))
    proof = prove(air, trace_u64, config, trace_sharding=sharding)
    if store is not None:
        store.put(job, "proof", {"proof": proof_to_json(proof)})
    return proof, False
