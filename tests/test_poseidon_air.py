"""ZK proof of the Poseidon permutation (preprocessed columns + degree-8
constraints) on the STARK stack."""

import numpy as np
import pytest

from vectorx_tpu.field.goldilocks import P
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.hash import poseidon_py
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.poseidon_air import PoseidonAir

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))
RNG = np.random.default_rng(11)


def test_poseidon_proof_roundtrip():
    state = [int(x) for x in RNG.integers(0, P, size=12, dtype=np.uint64)]
    air = PoseidonAir(state)
    assert air.output_state == poseidon_py.permute(state)
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)


def test_poseidon_proof_rejects_wrong_output():
    state = [int(x) for x in RNG.integers(0, P, size=12, dtype=np.uint64)]
    air = PoseidonAir(state)
    proof = prove(air, air.build_trace(), CFG)
    bad = PoseidonAir(state)
    bad.outputs = [list(o) for o in bad.outputs]
    bad.outputs[0][0] = (bad.outputs[0][0] + 1) % P
    assert not verify(bad, proof, CFG)


def test_poseidon_proof_rejects_bad_witness():
    state = [int(x) for x in RNG.integers(0, P, size=12, dtype=np.uint64)]
    air = PoseidonAir(state)
    trace = air.build_trace()
    trace[3, 11] = (trace[3, 11] + 1) % P  # corrupt a mid-permutation state
    with pytest.raises(AssertionError):
        prove(air, trace, CFG)


def test_poseidon_proof_rejects_tampered_constants_eval():
    state = [int(x) for x in RNG.integers(0, P, size=12, dtype=np.uint64)]
    air = PoseidonAir(state)
    proof = prove(air, air.build_trace(), CFG)
    a, b = proof.constants_at_zeta[0]
    proof.constants_at_zeta[0] = ((a + 1) % P, b)
    assert not verify(air, proof, CFG)


def test_poseidon_batch_proof():
    """Four independent permutations proven in one 128-row trace."""
    states = [[int(x) for x in RNG.integers(0, P, size=12, dtype=np.uint64)]
              for _ in range(4)]
    air = PoseidonAir(states)
    assert air.num_perms == 4 and air.n == 128
    for s, o in zip(states, air.outputs):
        assert o == poseidon_py.permute(s)
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)
    # wrong output for the third permutation must fail
    bad = PoseidonAir(states)
    bad.outputs = [list(o) for o in bad.outputs]
    bad.outputs[2][5] = (bad.outputs[2][5] + 1) % P
    assert not verify(bad, proof, CFG)
