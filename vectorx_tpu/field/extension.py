"""Quadratic extension field GF(p^2) = GF(p)[x] / (x^2 - W), W = 7.

Matches the reference proving stack's degree-2 extension (`const D: usize = 2`
at /root/reference/circuits/builder/subchain_verification.rs:448; plonky2's
`QuadraticExtension<GoldilocksField>` with W = 7).  An element is a pair of
base-field elements ``(a0, a1)`` = a0 + a1·x, each carried as (lo, hi) uint32
limb arrays — so a full extension element is a 4-tuple of arrays
``(a0l, a0h, a1l, a1h)``.

FRI challenges and the DEEP composition polynomial live here; the per-element
cost is 3 base muls + a few adds (Karatsuba).
"""

from __future__ import annotations

import jax.numpy as jnp

from vectorx_tpu.field import goldilocks as gl

W = 7  # x^2 = 7; 7 is a quadratic non-residue mod p.


def add(a, b):
    a0l, a0h, a1l, a1h = a
    b0l, b0h, b1l, b1h = b
    c0 = gl.add(a0l, a0h, b0l, b0h)
    c1 = gl.add(a1l, a1h, b1l, b1h)
    return (*c0, *c1)


def sub(a, b):
    a0l, a0h, a1l, a1h = a
    b0l, b0h, b1l, b1h = b
    c0 = gl.sub(a0l, a0h, b0l, b0h)
    c1 = gl.sub(a1l, a1h, b1l, b1h)
    return (*c0, *c1)


def mul(a, b):
    """(a0 + a1 x)(b0 + b1 x) = (a0 b0 + W a1 b1) + (a0 b1 + a1 b0) x."""
    a0l, a0h, a1l, a1h = a
    b0l, b0h, b1l, b1h = b
    t00 = gl.mul(a0l, a0h, b0l, b0h)
    t11 = gl.mul(a1l, a1h, b1l, b1h)
    # cross = (a0 + a1)(b0 + b1) - t00 - t11   (Karatsuba)
    sa = gl.add(a0l, a0h, a1l, a1h)
    sb = gl.add(b0l, b0h, b1l, b1h)
    cross = gl.mul(*sa, *sb)
    cross = gl.sub(*cross, *t00)
    cross = gl.sub(*cross, *t11)
    c0 = gl.add(*t00, *gl.mul_small(*t11, W))
    return (*c0, *cross)


def mul_base(a, bl, bh):
    """Multiply an extension element by a base-field element."""
    a0l, a0h, a1l, a1h = a
    c0 = gl.mul(a0l, a0h, bl, bh)
    c1 = gl.mul(a1l, a1h, bl, bh)
    return (*c0, *c1)


def sqr(a):
    return mul(a, a)


def neg(a):
    a0l, a0h, a1l, a1h = a
    return (*gl.neg(a0l, a0h), *gl.neg(a1l, a1h))


def inv(a):
    """1 / (a0 + a1 x) = (a0 - a1 x) / (a0^2 - W a1^2)."""
    a0l, a0h, a1l, a1h = a
    n0 = gl.sqr(a0l, a0h)
    n1 = gl.mul_small(*gl.sqr(a1l, a1h), W)
    norm = gl.sub(*n0, *n1)
    ninv = gl.inv(*norm)
    c0 = gl.mul(a0l, a0h, *ninv)
    c1 = gl.mul(*gl.neg(a1l, a1h), *ninv)
    return (*c0, *c1)


def pow_const(a, e: int):
    r = from_base(jnp.ones_like(a[0]), jnp.zeros_like(a[1]))
    b = a
    while e > 0:
        if e & 1:
            r = mul(r, b)
        e >>= 1
        if e:
            b = sqr(b)
    return r


def from_base(bl, bh):
    z = jnp.zeros_like(bl)
    return (bl, bh, z, z)


def eq(a, b):
    a0l, a0h, a1l, a1h = a
    b0l, b0h, b1l, b1h = b
    return gl.eq(a0l, a0h, b0l, b0h) & gl.eq(a1l, a1h, b1l, b1h)


def zeros(shape):
    z = jnp.zeros(shape, jnp.uint32)
    return (z, z, z, z)


def from_pair_u64(c0, c1):
    """Build from numpy arrays/ints of the two coefficients."""
    l0, h0 = gl.from_u64(c0)
    l1, h1 = gl.from_u64(c1)
    return (l0, h0, l1, h1)


def to_pair_u64(a):
    a0l, a0h, a1l, a1h = a
    return gl.to_u64(a0l, a0h), gl.to_u64(a1l, a1h)
