"""LogUp lookup argument: range-check AIR prove/verify + soundness.

The lookup plays the role of curta's shared 16-bit range table in the
reference's EdDSA/hash AIRs (SURVEY.md §2 E3) — the foundation for the
ed25519 field-op AIR.
"""

import numpy as np
import pytest

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.range_air import RangeCheckAir

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=12,
                                final_poly_len=4, pow_bits=0))
RNG = np.random.default_rng(11)


def _air(log_n=8, bits=6, V=4):
    vals = RNG.integers(0, 1 << bits, size=(V, (1 << log_n) - 1),
                        dtype=np.uint64)
    return RangeCheckAir(log_n, bits, vals)


def test_range_roundtrip():
    air = _air()
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)


def test_out_of_range_value_rejected_by_prover():
    air = _air()
    tr = air.build_trace()
    tr[0, 3] = 1 << air.bits  # out of range; no multiplicity can balance it
    with pytest.raises(AssertionError):
        prove(air, tr, CFG)


def test_wrong_multiplicity_rejected_by_prover():
    air = _air()
    tr = air.build_trace()
    tr[air.V, 2] += 1  # overcount one table entry
    with pytest.raises(AssertionError):
        prove(air, tr, CFG)


def test_tampered_aux_opening_rejected():
    air = _air()
    proof = prove(air, air.build_trace(), CFG)
    c0, c1 = proof.aux_at_zeta[0]
    proof.aux_at_zeta[0] = ((c0 + 1) % (2**64 - 2**32 + 1), c1)
    assert not verify(air, proof, CFG)


def test_swapped_value_between_columns_still_verifies():
    """The lookup is a multiset argument: permuting values among covered
    cells of the same pair keeps it balanced."""
    air = _air()
    tr = air.build_trace()
    tr[0, 5], tr[1, 5] = tr[1, 5], tr[0, 5]
    proof = prove(air, tr, CFG)
    assert verify(air, proof, CFG)
