"""Pallas single-pass NTT kernel vs the stage-by-stage XLA path.

The kernel (ntt/pallas_ntt.py) must be BIT-identical to ntt._transform —
it replaces it on TPU for VMEM-resident sizes, and every proof/verify
round-trip depends on prover and verifier agreeing on evaluation order.
Runs in Pallas interpret mode on the CPU mesh (the real-TPU compile of the
same kernel is exercised by bench.py / the evidence drivers on hardware).
"""

import importlib

import numpy as np
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.ntt import pallas_ntt

ntt_mod = importlib.import_module("vectorx_tpu.ntt.ntt")


@pytest.mark.parametrize("log_n", [10, 11, 12])
@pytest.mark.parametrize("inverse", [False, True])
def test_matches_xla_transform(log_n, inverse):
    rng = np.random.default_rng(7 + log_n)
    n = 1 << log_n
    x = rng.integers(0, gl.P, size=(3, n), dtype=np.uint64)
    lo, hi = gl.from_u64(x)
    rl, rh = ntt_mod._transform(lo, hi, log_n, inverse)
    pl_, ph = pallas_ntt.transform(lo, hi, log_n, inverse, True)
    assert (gl.to_u64(rl, rh) == gl.to_u64(pl_, ph)).all()


@pytest.mark.parametrize("inverse", [False, True])
def test_big_fourstep_matches_xla(inverse):
    # transform_big's XLA-level four-step, shrunk to interpret scale
    # (halves of 5+5 bits; on hardware it only runs with halves >= 10)
    rng = np.random.default_rng(11)
    log_n = 10
    n = 1 << log_n
    x = rng.integers(0, gl.P, size=(2, n), dtype=np.uint64)
    lo, hi = gl.from_u64(x)
    rl, rh = ntt_mod._transform(lo, hi, log_n, inverse)
    bl, bh = pallas_ntt.transform_big(lo, hi, log_n, inverse, True)
    assert (gl.to_u64(rl, rh) == gl.to_u64(bl, bh)).all()


def test_supported_sizes():
    assert not pallas_ntt.supported(9)
    assert all(pallas_ntt.supported(k) for k in range(10, 19))
    assert not pallas_ntt.supported(19)      # 9-bit half below kernel min
    assert all(pallas_ntt.supported(k) for k in range(20, 25))
    assert not pallas_ntt.supported(25)      # twiddle grid outgrows HBM use


def test_roundtrip_and_leading_dims():
    rng = np.random.default_rng(3)
    n = 1 << 10
    x = rng.integers(0, gl.P, size=(2, 2, n), dtype=np.uint64)
    lo, hi = gl.from_u64(x)
    fl, fh = pallas_ntt.transform(lo, hi, 10, False, True)
    bl, bh = pallas_ntt.transform(fl, fh, 10, True, True)
    assert (gl.to_u64(bl, bh) == x).all()


def test_noncanonical_inputs():
    # non-canonical limbs (values in [p, 2^64)) must transform identically
    rng = np.random.default_rng(5)
    n = 1 << 10
    x = rng.integers(0, gl.P, size=(1, n), dtype=np.uint64)
    lo, hi = gl.from_u64(x)
    # genuinely non-canonical entries: x + p wherever it fits in 64 bits
    fits = x < np.uint64((1 << 64) - gl.P)
    xnc = np.where(fits, x + np.uint64(gl.P), x)
    lo2, hi2 = gl.from_u64(xnc)
    a = gl.to_u64(*pallas_ntt.transform(lo, hi, 10, False, True))
    b = gl.to_u64(*pallas_ntt.transform(lo2, hi2, 10, False, True))
    assert (a == b).all()
