"""Sharded STARK prove: GSPMD domain sharding + checkpoint resume.

The full prove runs on the 8-device virtual CPU mesh in the slow tier
(and inside the driver's `dryrun_multichip`); the default tier covers the
proof (de)serialization that checkpointing rests on."""

import os

import pytest

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.parallel.scheduler import CheckpointStore
from vectorx_tpu.parallel.sharded_prove import (proof_from_json,
                                                proof_to_json, prove_sharded)
from vectorx_tpu.stark import FibonacciAir, StarkConfig, prove
from vectorx_tpu.stark.verifier import verify

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=2,
                                final_poly_len=2, pow_bits=0))


def test_proof_json_roundtrip():
    air = FibonacciAir(log_n=4)
    proof = prove(air, air.build_trace(), CFG)
    blob = proof_to_json(proof)
    back = proof_from_json(blob)
    assert back.trace_cap == proof.trace_cap
    assert back.fri_proof.final_coeffs == proof.fri_proof.final_coeffs
    assert back.trace_openings[0].leaf == proof.trace_openings[0].leaf
    assert verify(air, back, CFG)
    import json

    json.dumps(blob)          # store-compatible: pure JSON


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS", "0") != "1",
                    reason="8-way partitioned compile is minutes-long; "
                           "the driver's dryrun_multichip runs this path "
                           "every round")
def test_sharded_prove_matches_unsharded_and_resumes():
    from vectorx_tpu.parallel.mesh import make_mesh

    air = FibonacciAir(log_n=5)
    mesh = make_mesh(8, axis_name="batch")
    store = CheckpointStore()
    p, hit = prove_sharded(air, air.build_trace(), CFG, mesh, store=store)
    assert not hit and verify(air, p, CFG)
    pu = prove(air, air.build_trace(), CFG)
    assert p.trace_cap == pu.trace_cap
    assert p.fri_proof.final_coeffs == pu.fri_proof.final_coeffs
    p2, hit2 = prove_sharded(air, air.build_trace(), CFG, mesh, store=store)
    assert hit2 and verify(air, p2, CFG)
