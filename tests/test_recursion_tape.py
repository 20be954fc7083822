"""Shadow-verifier tape: witness-mode replay accepts exactly the proofs
the host verifier accepts, and the tape structure is proof-independent
(statement mode == witness mode, node for node)."""

import copy

import pytest

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import FibonacciAir, StarkConfig, prove, verify
from vectorx_tpu.recursion.shadow import verifier_tape
from vectorx_tpu.recursion.ssa import Builder, TapeCheckFailed

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=4,
                                final_poly_len=4, pow_bits=4))


def _setup():
    air = FibonacciAir(log_n=4)
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    return air, proof


AIR, PROOF = _setup()


def test_tape_accepts_valid_proof():
    b = Builder(witness=True)
    n_pub = verifier_tape(b, AIR, CFG, proof=PROOF)
    assert n_pub == 3
    assert len(b.nodes) > 500


def test_tape_structure_is_proof_independent():
    bw = Builder(witness=True)
    verifier_tape(bw, AIR, CFG, proof=PROOF)
    bs = Builder(witness=False)
    verifier_tape(bs, AIR, CFG, proof=None)
    assert len(bw.nodes) == len(bs.nodes)
    for nw, ns in zip(bw.nodes, bs.nodes):
        assert type(nw) is type(ns)


@pytest.mark.parametrize("mutate", [
    lambda p: p.trace_at_zeta.__setitem__(
        0, ((p.trace_at_zeta[0][0] + 1) % (2**64 - 2**32 + 1),
            p.trace_at_zeta[0][1])),
    lambda p: p.trace_cap[0].__setitem__(0, (p.trace_cap[0][0] + 1)),
    lambda p: p.fri_proof.final_coeffs.__setitem__(
        0, ((p.fri_proof.final_coeffs[0][0] + 1), 0)),
    lambda p: p.trace_openings[0].leaf.__setitem__(
        0, p.trace_openings[0].leaf[0] + 1),
    lambda p: p.fri_proof.query_rounds[0].steps[0].pair.__setitem__(
        0, p.fri_proof.query_rounds[0].steps[0].pair[0] + 1),
    lambda p: setattr(p.fri_proof, "pow_witness",
                      p.fri_proof.pow_witness + 1),
])
def test_tape_rejects_tampered_proofs(mutate):
    bad = copy.deepcopy(PROOF)
    mutate(bad)
    assert not verify(AIR, bad, CFG)   # host agrees it's bad
    b = Builder(witness=True)
    with pytest.raises(TapeCheckFailed):
        verifier_tape(b, AIR, CFG, proof=bad)


def test_tape_rejects_wrong_statement():
    other = FibonacciAir(log_n=4, a0=2, b0=3)
    b = Builder(witness=True)
    with pytest.raises(TapeCheckFailed):
        verifier_tape(b, other, CFG, proof=PROOF)
