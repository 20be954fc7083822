"""Goldilocks limb-kernel correctness vs the Python bigint oracle."""

import numpy as np
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.field import reference as ref

P = gl.P
RNG = np.random.default_rng(0)


def rand_u64(n, include_noncanonical=True):
    """Random test values covering canonical and non-canonical ranges."""
    hi = 1 << 64 if include_noncanonical else P
    vals = RNG.integers(0, hi, size=n, dtype=np.uint64)
    # Salt with boundary cases.
    edge = np.array(
        [0, 1, 2, 0xFFFFFFFF, 1 << 32, P - 2, P - 1, P % (1 << 64),
         (1 << 64) - 1, P + 1],
        dtype=np.uint64,
    )
    return np.concatenate([edge[: min(len(edge), n)], vals])[:n]


def test_roundtrip():
    x = rand_u64(256)
    lo, hi = gl.from_u64(x)
    back = gl.to_u64(lo, hi)
    assert np.array_equal(back, (x.astype(object) % P).astype(np.uint64))


def test_double_wrap_edge_cases():
    """a+b ≥ 2^65 − 2^32 makes the first EPSILON fold wrap again — the
    regression behind the size-32 delta-vector iNTT failure."""
    tops = [(1 << 64) - 1, (1 << 64) - 2, (1 << 64) - (1 << 32),
            (1 << 64) - (1 << 32) + 1, (1 << 63) + (1 << 62)]
    a = np.array([x for x in tops for _ in tops], dtype=np.uint64)
    b = np.array(tops * len(tops), dtype=np.uint64)
    al, ah = gl.from_u64(a)
    bl, bh = gl.from_u64(b)
    got_add = gl.to_u64(*gl.add(al, ah, bl, bh))
    got_sub = gl.to_u64(*gl.sub(al, ah, bl, bh))
    for i in range(len(a)):
        assert int(got_add[i]) == ref.add(int(a[i]), int(b[i])), f"add {i}"
        assert int(got_sub[i]) == ref.sub(int(a[i]), int(b[i])), f"sub {i}"


@pytest.mark.parametrize("op,refop", [
    (gl.add, ref.add),
    (gl.sub, ref.sub),
    (gl.mul, ref.mul),
])
def test_binary_ops(op, refop):
    a = rand_u64(512)
    b = rand_u64(512)[::-1].copy()
    al, ah = gl.from_u64(a)
    bl, bh = gl.from_u64(b)
    out = gl.to_u64(*op(al, ah, bl, bh))
    exp = np.array(
        [refop(int(x), int(y)) for x, y in zip(a, b)], dtype=np.uint64
    )
    assert np.array_equal(out, exp)


def test_mul64_wide_exact():
    a = rand_u64(256)
    b = rand_u64(256)[::-1].copy()
    al, ah = gl.from_u64(a)
    bl, bh = gl.from_u64(b)
    r0, r1, r2, r3 = gl.mul64_wide(al, ah, bl, bh)
    r = [np.asarray(x, dtype=np.uint64) for x in (r0, r1, r2, r3)]
    got = [
        int(r[0][i]) | (int(r[1][i]) << 32) | (int(r[2][i]) << 64)
        | (int(r[3][i]) << 96)
        for i in range(len(a))
    ]
    exp = [int(x) * int(y) for x, y in zip(a, b)]
    assert got == exp


def test_inv():
    a = rand_u64(64)
    al, ah = gl.from_u64(a)
    out = gl.to_u64(*gl.inv(al, ah))
    exp = np.array([ref.inv(int(x)) for x in a], dtype=np.uint64)
    assert np.array_equal(out, exp)
    # a * inv(a) == 1 for nonzero a
    il, ih = gl.inv(al, ah)
    prod = gl.to_u64(*gl.mul(al, ah, il, ih))
    expected_ones = np.where(np.array([int(x) % P for x in a]) == 0, 0, 1)
    assert np.array_equal(prod, expected_ones.astype(np.uint64))


def test_mul_small():
    a = rand_u64(128)
    al, ah = gl.from_u64(a)
    for k in (0, 1, 2, 7, 0xFFFFFFFF):
        out = gl.to_u64(*gl.mul_small(al, ah, k))
        exp = np.array([ref.mul(int(x), k) for x in a], dtype=np.uint64)
        assert np.array_equal(out, exp), f"k={k}"


def test_generator_order():
    # w = 7^((p-1)/2^32) has multiplicative order exactly 2^32.
    w = gl.POWER_OF_TWO_GENERATOR
    assert pow(w, 1 << 32, P) == 1
    assert pow(w, 1 << 31, P) != 1


def test_eq_and_canonicalize():
    a = np.array([P % (1 << 64) + 5, 5, P - 1, (1 << 64) - 1], dtype=np.uint64)
    b = np.array([5, 5, P - 1, ((1 << 64) - 1) % P], dtype=np.uint64)
    al, ah = gl.from_u64(a)
    bl, bh = gl.from_u64(b)
    assert np.asarray(gl.eq(al, ah, bl, bh)).all()
