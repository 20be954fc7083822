"""End-to-end STARK prove + verify on the Fibonacci AIR.

This is the `dummy_rotate`-scale tiny-circuit milestone from SURVEY.md §7
("minimum end-to-end slice"): trace → NTT/LDE → Poseidon Merkle → quotient →
DEEP → FRI, verified by the host-side verifier.
"""

import numpy as np
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import FibonacciAir, StarkConfig, prove, verify

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=12,
                                final_poly_len=4, pow_bits=0))


def test_fibonacci_roundtrip():
    air = FibonacciAir(log_n=5)
    trace = air.build_trace()
    proof = prove(air, trace, CFG)
    assert verify(air, proof, CFG)


def test_rejects_wrong_public_input():
    air = FibonacciAir(log_n=5)
    proof = prove(air, air.build_trace(), CFG)
    bad_air = FibonacciAir(log_n=5)
    bad_air.final = (bad_air.final + 1) % gl.P
    assert not verify(bad_air, proof, CFG)


def test_rejects_invalid_trace():
    air = FibonacciAir(log_n=4)
    trace = air.build_trace()
    trace[1, 7] = (trace[1, 7] + 1) % gl.P  # break the recurrence mid-trace
    # the prover's own divisibility check must fire
    with pytest.raises(AssertionError):
        prove(air, trace, CFG)


def test_rejects_tampered_opening():
    air = FibonacciAir(log_n=4)
    proof = prove(air, air.build_trace(), CFG)
    a, b = proof.trace_at_zeta[0]
    proof.trace_at_zeta[0] = ((a + 1) % gl.P, b)
    assert not verify(air, proof, CFG)


def test_chunked_lde_bit_exact(monkeypatch):
    """Row-chunked LDE (the wide-trace HBM bound) is bit-identical to the
    full-width transform: same caps, same openings, verifies."""
    from vectorx_tpu.stark import stages

    air = FibonacciAir(log_n=4)
    full = prove(air, air.build_trace(), CFG)
    monkeypatch.setattr(stages, "LDE_CHUNK_ELEMS", 1 << 7)
    chunked = prove(air, air.build_trace(), CFG)
    assert full.trace_cap == chunked.trace_cap
    assert full.quotient_cap == chunked.quotient_cap
    assert full.trace_at_zeta == chunked.trace_at_zeta
    assert verify(air, chunked, CFG)


def test_streamed_prover_bit_exact():
    """The coset-streamed prover (wide-AIR memory path) emits bit-identical
    proofs: same caps, same openings, same FRI transcript."""
    from vectorx_tpu.stark.prover import prove_streamed

    air = FibonacciAir(log_n=4)
    full = prove(air, air.build_trace(), CFG)
    streamed = prove_streamed(air, air.build_trace(), CFG)
    assert full.trace_cap == streamed.trace_cap
    assert full.quotient_cap == streamed.quotient_cap
    assert full.trace_at_zeta == streamed.trace_at_zeta
    assert full.quotient_at_zeta == streamed.quotient_at_zeta
    assert [o.leaf for o in full.trace_openings] == \
        [o.leaf for o in streamed.trace_openings]
    assert [o.path for o in full.quotient_openings] == \
        [o.path for o in streamed.quotient_openings]
    assert verify(air, streamed, CFG)


def test_proof_json_roundtrip():
    """Wire-format round-trip: proof -> JSON -> proof verifies and is
    value-identical (the reference ships serialized proofs — its tests
    pin serializer round-trips the same way, header_range.rs:101-127)."""
    import json

    from vectorx_tpu.stark.serialize import proof_from_json, proof_to_json

    air = FibonacciAir(log_n=4)
    proof = prove(air, air.build_trace(), CFG)
    wire = json.dumps(proof_to_json(proof))
    back = proof_from_json(json.loads(wire))
    assert back.trace_cap == proof.trace_cap
    assert back.trace_at_zeta == list(proof.trace_at_zeta)
    assert back.fri_proof.final_coeffs == list(proof.fri_proof.final_coeffs)
    assert verify(air, back, CFG)
