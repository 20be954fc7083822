"""Aggregation: N child proofs -> ONE machine proof.

One aggregation is proven at module scope (machine proves are the
expensive part) and every test checks a different property of it."""

import copy

import pytest

from vectorx_tpu.field.goldilocks import P
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import FibonacciAir, StarkConfig, prove, verify
from vectorx_tpu.stark.poseidon_air import PoseidonAir
from vectorx_tpu.recursion.aggregate import aggregate_prove, aggregate_verify
from vectorx_tpu.recursion.ssa import TapeCheckFailed

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=2,
                                final_poly_len=2, pow_bits=1))


def _children():
    """Heterogeneous children: a Fibonacci statement + one Poseidon
    permutation (exercises the preprocessed-constants path in the tape)."""
    return [FibonacciAir(log_n=3), PoseidonAir(list(range(12)))]


CHILDREN = _children()
PROOFS = [prove(a, a.build_trace(), CFG) for a in CHILDREN]
AGG = aggregate_prove(CHILDREN, PROOFS, CFG)


def test_aggregate_roundtrip():
    assert aggregate_verify(_children(), AGG.proof, CFG)
    # machine publics = concatenated child publics at recorded offsets
    pubs = AGG.machine_air.public_inputs()
    for air, off in zip(CHILDREN, AGG.public_offsets):
        cp = [int(v) % P for v in air.public_inputs()]
        assert pubs[off:off + len(cp)] == cp


def test_aggregate_rejects_bad_child_proof():
    bad = [copy.deepcopy(p) for p in PROOFS]
    bad[0].trace_at_zeta[0] = ((bad[0].trace_at_zeta[0][0] + 1) % P,
                               bad[0].trace_at_zeta[0][1])
    assert not verify(CHILDREN[0], bad[0], CFG)
    with pytest.raises(TapeCheckFailed):
        aggregate_prove(CHILDREN, bad, CFG)


def test_aggregate_rejects_wrong_statement():
    wrong = _children()
    wrong[0] = FibonacciAir(log_n=3, a0=9, b0=9)
    assert not aggregate_verify(wrong, AGG.proof, CFG)
    # extra/missing children change the program too
    assert not aggregate_verify(_children()[:1], AGG.proof, CFG)


def test_aggregate_rejects_tampered_outer_proof():
    bad = copy.deepcopy(AGG.proof)
    bad.fri_proof.final_coeffs[0] = (
        (bad.fri_proof.final_coeffs[0][0] + 1) % P,
        bad.fri_proof.final_coeffs[0][1])
    assert not aggregate_verify(_children(), bad, CFG)


def test_stripped_witness_program_matches_statement_rebuild():
    """Soundness of the machine-VK cache seed (aggregate.strip_witness):
    the witness-mode program minus its value assignment must equal the
    statement-mode rebuild bit for bit — items, reads, publics, rows."""
    from vectorx_tpu.recursion.aggregate import (_build_tape, compile_tape,
                                                 strip_witness)

    stripped = strip_witness(AGG.machine_air.program)
    b, _ = _build_tape(_children(), CFG, proofs=None)
    rebuilt = compile_tape(b)
    assert stripped.n_rows == rebuilt.n_rows
    assert stripped.publics == rebuilt.publics
    assert stripped.reads == rebuilt.reads
    assert stripped.items == rebuilt.items
    assert stripped.values is None and not stripped.witness


def test_aggregate_verify_uses_vk_cache(monkeypatch):
    """A cache hit must skip the host tape re-derivation entirely (the
    round-3 92 s/verify cost) and still verify; a statement set that
    misses the cache still rebuilds and rejects."""
    from vectorx_tpu.recursion import aggregate as agg

    def boom(*a, **k):
        raise AssertionError("tape re-derivation ran despite cache hit")

    monkeypatch.setattr(agg, "_build_tape", boom)
    assert agg.aggregate_verify(_children(), AGG.proof, CFG)
