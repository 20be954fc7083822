"""NTT/iNTT/LDE correctness vs a bigint DFT oracle."""

import numpy as np

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.field import reference as ref
from vectorx_tpu.ntt import coset_intt, coset_ntt, intt, lde, ntt
from vectorx_tpu.ntt.ntt import _root_of_unity

P = gl.P
RNG = np.random.default_rng(1)


def rand_poly(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64)


def dft_oracle(coeffs, w):
    n = len(coeffs)
    return np.array(
        [
            sum(int(c) * pow(w, (i * j) % n, P) for j, c in enumerate(coeffs)) % P
            for i in range(n)
        ],
        dtype=np.uint64,
    )


def test_ntt_matches_dft():
    for log_n in (0, 1, 3, 5):
        n = 1 << log_n
        c = rand_poly(n)
        w = _root_of_unity(log_n, inverse=False)
        exp = dft_oracle(c, w)
        out = gl.to_u64(*ntt(*gl.from_u64(c)))
        assert np.array_equal(out, exp), f"n={n}"


def test_roundtrip():
    for log_n in (1, 4, 5, 8, 12):
        n = 1 << log_n
        c = rand_poly(n)
        cl, ch = gl.from_u64(c)
        back = gl.to_u64(*intt(*ntt(cl, ch)))
        assert np.array_equal(back, c % np.uint64(P)), f"n={n}"


def test_roundtrip_structured_vectors():
    """Delta/selector-style vectors drive the arithmetic into the
    double-wrap edge case the random vectors miss (regression for the
    Poseidon-AIR selector-column interpolation failure)."""
    for log_n in (5, 6, 8):
        n = 1 << log_n
        for idx in ([n - 1], [n - 2, n - 1], [0], [0, 1, 2, 3]):
            d = np.zeros(n, dtype=np.uint64)
            d[idx] = 1
            back = gl.to_u64(*ntt(*intt(*gl.from_u64(d))))
            assert np.array_equal(back, d), f"n={n} idx={idx} (ntt∘intt)"
            back2 = gl.to_u64(*intt(*ntt(*gl.from_u64(d))))
            assert np.array_equal(back2, d), f"n={n} idx={idx} (intt∘ntt)"


def test_batched():
    c = rand_poly(4 * 64).reshape(4, 64)
    cl, ch = gl.from_u64(c)
    out = gl.to_u64(*ntt(cl, ch))
    for i in range(4):
        single = gl.to_u64(*ntt(*gl.from_u64(c[i])))
        assert np.array_equal(out[i], single)


def test_coset_roundtrip():
    n = 128
    c = rand_poly(n)
    cl, ch = gl.from_u64(c)
    back = gl.to_u64(*coset_intt(*coset_ntt(cl, ch)))
    assert np.array_equal(back, c % np.uint64(P))


def test_coset_ntt_is_shifted_eval():
    # coset_ntt(c)[i] == poly(c, g * w^i)
    log_n = 4
    n = 1 << log_n
    c = rand_poly(n)
    out = gl.to_u64(*coset_ntt(*gl.from_u64(c)))
    w = _root_of_unity(log_n, inverse=False)
    g = gl.GENERATOR
    for i in range(n):
        x = (g * pow(w, i, P)) % P
        val = 0
        for j in reversed(range(n)):
            val = (val * x + int(c[j])) % P
        assert int(out[i]) == val, f"i={i}"


def test_lde_extends_low_degree():
    # LDE of evaluations of a degree<n polynomial agrees with direct
    # evaluation on the blown-up coset.
    log_n, rate_bits = 3, 2
    n = 1 << log_n
    c = rand_poly(n)
    vals = ntt(*gl.from_u64(c))
    ext = gl.to_u64(*lde(*vals, rate_bits=rate_bits))
    big_n = n << rate_bits
    w = _root_of_unity(log_n + rate_bits, inverse=False)
    for i in range(0, big_n, 5):
        x = (gl.GENERATOR * pow(w, i, P)) % P
        val = 0
        for j in reversed(range(n)):
            val = (val * x + int(c[j])) % P
        assert int(ext[i]) == val, f"i={i}"


def test_extension_field():
    from vectorx_tpu.field import extension as ge

    a0, a1 = rand_poly(32), rand_poly(32)
    b0, b1 = rand_poly(32), rand_poly(32)
    a = ge.from_pair_u64(a0, a1)
    b = ge.from_pair_u64(b0, b1)
    m0, m1 = ge.to_pair_u64(ge.mul(a, b))
    for i in range(32):
        x0, x1, y0, y1 = int(a0[i]), int(a1[i]), int(b0[i]), int(b1[i])
        e0 = (x0 * y0 + ge.W * x1 * y1) % P
        e1 = (x0 * y1 + x1 * y0) % P
        assert (int(m0[i]), int(m1[i])) == (e0, e1)
    # inverse
    ia = ge.inv(a)
    p0, p1 = ge.to_pair_u64(ge.mul(a, ia))
    assert np.all(p0 == 1) and np.all(p1 == 0)
