"""FRI low-degree proof round-trip and soundness smoke tests."""

import numpy as np
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.fri.fri import FriConfig, fri_verify, prove_low_degree
from vectorx_tpu.fri.transcript import Challenger
from vectorx_tpu.ntt import lde

P = gl.P
RNG = np.random.default_rng(3)
CFG = FriConfig(rate_bits=3, cap_height=1, num_queries=16, final_poly_len=4,
                pow_bits=0)


def make_codeword(log_n, rate_bits, seed=None):
    rng = np.random.default_rng(seed) if seed is not None else RNG
    n = 1 << log_n
    c0 = rng.integers(0, P, size=n, dtype=np.uint64)
    c1 = rng.integers(0, P, size=n, dtype=np.uint64)
    # evaluations on H then LDE to the coset (degree < n guaranteed)
    v0 = lde(*gl.from_u64(c0), rate_bits=rate_bits)
    v1 = lde(*gl.from_u64(c1), rate_bits=rate_bits)
    return (*v0, *v1)


def test_fri_roundtrip():
    log_n = 6
    code = make_codeword(log_n, CFG.rate_bits)
    proof = prove_low_degree(code, log_n + CFG.rate_bits, gl.GENERATOR, CFG,
                             Challenger())
    assert fri_verify(proof, log_n + CFG.rate_bits, gl.GENERATOR, CFG,
                      Challenger())


def test_fri_rejects_tampering():
    log_n = 5
    code = make_codeword(log_n, CFG.rate_bits, seed=7)
    proof = prove_low_degree(code, log_n + CFG.rate_bits, gl.GENERATOR, CFG,
                             Challenger())
    # tamper with a final coefficient
    bad = prove_low_degree(code, log_n + CFG.rate_bits, gl.GENERATOR, CFG,
                           Challenger())
    bad.final_coeffs = list(bad.final_coeffs)
    a, b = bad.final_coeffs[0]
    bad.final_coeffs[0] = ((a + 1) % P, b)
    assert not fri_verify(bad, log_n + CFG.rate_bits, gl.GENERATOR, CFG,
                          Challenger())
    # tamper with a query leaf value
    bad2 = prove_low_degree(code, log_n + CFG.rate_bits, gl.GENERATOR, CFG,
                            Challenger())
    bad2.query_rounds[0].steps[0].pair = [
        (bad2.query_rounds[0].steps[0].pair[0] + 1) % P,
        *bad2.query_rounds[0].steps[0].pair[1:],
    ]
    assert not fri_verify(bad2, log_n + CFG.rate_bits, gl.GENERATOR, CFG,
                          Challenger())


def test_fri_rejects_high_degree():
    # A random codeword (not low-degree) must fail the prover's degree check.
    log_len = 8
    n = 1 << log_len
    c0 = RNG.integers(0, P, size=n, dtype=np.uint64)
    c1 = RNG.integers(0, P, size=n, dtype=np.uint64)
    code = (*gl.from_u64(c0), *gl.from_u64(c1))
    with pytest.raises(AssertionError):
        prove_low_degree(code, log_len, gl.GENERATOR, CFG, Challenger())


def test_fri_rejects_wrong_proof_shape():
    """ADVICE.md high finding: a prover sending caps=[] plus the FULL
    interpolation of an arbitrary codeword as final_coeffs must be rejected
    by proof-shape validation (otherwise the low-degree bound is void)."""
    from vectorx_tpu.fri.fri import FriProof, fri_replay
    from vectorx_tpu.ntt import coset_intt

    log_len = 8
    n = 1 << log_len
    c0 = np.random.default_rng(11).integers(0, P, size=n, dtype=np.uint64)
    c1 = np.random.default_rng(12).integers(0, P, size=n, dtype=np.uint64)
    # full coefficient interpolation of a random (high-degree) codeword
    f0 = gl.to_u64(*coset_intt(*gl.from_u64(c0), shift=gl.GENERATOR))
    f1 = gl.to_u64(*coset_intt(*gl.from_u64(c1), shift=gl.GENERATOR))
    forged = FriProof(
        caps=[], final_coeffs=[(int(a), int(b)) for a, b in zip(f0, f1)],
        pow_witness=0, query_rounds=[])
    assert fri_replay(forged, log_len, CFG, Challenger()) is None
    assert not fri_verify(forged, log_len, gl.GENERATOR, CFG, Challenger())

    # honest proof with one fold layer stripped must also fail the replay
    code = make_codeword(5, CFG.rate_bits, seed=13)
    proof = prove_low_degree(code, 5 + CFG.rate_bits, gl.GENERATOR, CFG,
                             Challenger())
    proof.caps = proof.caps[:-1]
    assert fri_replay(proof, 5 + CFG.rate_bits, CFG, Challenger()) is None


def test_fri_pow_grinding():
    cfg = FriConfig(rate_bits=3, cap_height=0, num_queries=4,
                    final_poly_len=4, pow_bits=4)
    log_n = 4
    code = make_codeword(log_n, cfg.rate_bits, seed=9)
    proof = prove_low_degree(code, log_n + cfg.rate_bits, gl.GENERATOR, cfg,
                             Challenger())
    assert fri_verify(proof, log_n + cfg.rate_bits, gl.GENERATOR, cfg,
                      Challenger())
