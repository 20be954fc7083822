"""Goldilocks field GF(p), p = 2^64 - 2^32 + 1, as TPU-native uint32 limb math.

TPUs have no native 64-bit integer multiply, so a field element is carried as
a pair of uint32 arrays ``(lo, hi)`` (value = lo + hi * 2^32).  All kernels
here are pure `jax.numpy` on uint32 and compile to VPU element-wise ops; the
same code runs under `jit`, `vmap`, `shard_map`, and inside Pallas kernel
bodies.

Semantics follow the reference proving stack's field
(plonky2 `GoldilocksField`, used throughout /root/reference/circuits — e.g.
circuits/builder/header.rs:30, circuits/builder/subchain_verification.rs:448):

* elements are kept in a *non-canonical* representation in [0, 2^64) and only
  canonicalized (folded into [0, p)) at comparisons / digests / outputs;
* 128-bit products are reduced with the identities
  2^64 ≡ 2^32 - 1 (mod p)   and   2^96 ≡ -1 (mod p),
  i.e. ``reduce128(n) = n_lo - n_hi_hi + n_hi_lo * (2^32 - 1)`` with
  carry/borrow fixups of EPSILON = 2^32 - 1.

The scalar reference model used by the tests lives in
`vectorx_tpu.field.reference` (pure Python ints).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Field modulus p = 2^64 - 2^32 + 1 and its split into uint32 limbs.
# Constants are numpy scalars (not device arrays) so they constant-fold into
# any trace — including Pallas kernel bodies, which reject captured device
# constants.
import numpy as np  # noqa: E402  (used for trace-safe scalar constants)

P = (1 << 64) - (1 << 32) + 1
P_LO = np.uint32(1)            # p mod 2^32
P_HI = np.uint32(0xFFFFFFFF)   # p >> 32
EPSILON = np.uint32(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p

MASK16 = np.uint32(0xFFFF)
U32_ZERO = np.uint32(0)
U32_ONE = np.uint32(1)

# Multiplicative group generator and two-adic subgroup generator (order 2^32).
# g = 7;  w = 7^((p-1) / 2^32) mod p.  TWO_ADICITY = 32.
GENERATOR = 7
TWO_ADICITY = 32
POWER_OF_TWO_GENERATOR = pow(GENERATOR, (P - 1) >> TWO_ADICITY, P)


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# 64-bit primitive ops on (lo, hi) uint32 pairs.
# ---------------------------------------------------------------------------

def add64(al, ah, bl, bh):
    """(a + b) mod 2^64 plus the carry-out bit (as uint32 0/1)."""
    sl = al + bl
    c0 = (sl < al).astype(jnp.uint32)
    sh0 = ah + bh
    c1 = (sh0 < ah).astype(jnp.uint32)
    sh = sh0 + c0
    c2 = (sh < sh0).astype(jnp.uint32)
    return sl, sh, c1 | c2


def sub64(al, ah, bl, bh):
    """(a - b) mod 2^64 plus the borrow-out bit (as uint32 0/1)."""
    dl = al - bl
    b0 = (al < bl).astype(jnp.uint32)
    dh0 = ah - bh
    b1 = (ah < bh).astype(jnp.uint32)
    dh = dh0 - b0
    b2 = (dh0 < b0).astype(jnp.uint32)
    return dl, dh, b1 | b2


def mul32(a, b):
    """Full 32x32 -> 64-bit product of uint32 arrays, as (lo, hi) uint32."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    t = a0 * b0
    u = a1 * b0 + (t >> 16)          # <= (2^16-1)^2 + (2^16-1) < 2^32
    v = a0 * b1 + (u & MASK16)       # same bound
    hi = a1 * b1 + (u >> 16) + (v >> 16)
    lo = (v << 16) | (t & MASK16)
    return lo, hi


def mul64_wide(al, ah, bl, bh):
    """Full 64x64 -> 128-bit product as four uint32 limbs (r0..r3, LSB first)."""
    p0l, p0h = mul32(al, bl)
    p1l, p1h = mul32(al, bh)
    p2l, p2h = mul32(ah, bl)
    p3l, p3h = mul32(ah, bh)

    r0 = p0l
    # r1 = p0h + p1l + p2l  (collect carries into r2)
    s = p0h + p1l
    c1 = (s < p0h).astype(jnp.uint32)
    r1 = s + p2l
    c1 = c1 + (r1 < s).astype(jnp.uint32)
    # r2 = p1h + p2h + p3l + c1  (collect carries into r3)
    s = p1h + p2h
    c2 = (s < p1h).astype(jnp.uint32)
    s2 = s + p3l
    c2 = c2 + (s2 < s).astype(jnp.uint32)
    r2 = s2 + c1
    c2 = c2 + (r2 < s2).astype(jnp.uint32)
    # True r3 < 2^32 always (product < 2^128), so a wrapping add is exact.
    r3 = p3h + c2
    return r0, r1, r2, r3


# ---------------------------------------------------------------------------
# Goldilocks reduction and field ops (non-canonical in [0, 2^64)).
# ---------------------------------------------------------------------------

def reduce128(r0, r1, r2, r3):
    """Reduce a 128-bit value (4 uint32 limbs) mod p -> (lo, hi) in [0,2^64).

    n = n_lo + 2^64 * (a + 2^32 * b)  with a = r2, b = r3.
    n ≡ n_lo + a * (2^32 - 1) - b  (mod p).
    """
    a = r2
    b = r3
    # t0 = n_lo - b  (on borrow, subtract EPSILON once more: -2^64 ≡ -(2^32-1))
    t0l, t0h, brw = sub64(r0, r1, b, U32_ZERO)
    el = EPSILON * brw  # 0 or EPSILON
    t0l, t0h, _ = sub64(t0l, t0h, el, U32_ZERO)
    # t1 = a * EPSILON = (a << 32) - a
    nz = (a != 0).astype(jnp.uint32)
    t1l = U32_ZERO - a            # (2^32 - a) mod 2^32
    t1h = a - nz
    # result = t0 + t1; fold wraps as +EPSILON (t1 ≤ (2^32-1)^2 bounds the
    # chain so two folds are provably enough)
    sl, sh, cry = add64(t0l, t0h, t1l, t1h)
    sl, sh, cry = add64(sl, sh, EPSILON * cry, U32_ZERO)
    sl, sh, _ = add64(sl, sh, EPSILON * cry, U32_ZERO)
    return sl, sh


def add(al, ah, bl, bh):
    """Field addition of non-canonical elements (result non-canonical).

    Each 2^64 wrap folds back as +EPSILON; the first fold can itself wrap
    when a+b ≥ 2^65 − 2^32 (both inputs near 2^64), so fold twice with
    exact carries — after the second fold the value is < 2^33, no third.
    """
    sl, sh, cry = add64(al, ah, bl, bh)
    sl, sh, cry = add64(sl, sh, EPSILON * cry, U32_ZERO)
    sl, sh, _ = add64(sl, sh, EPSILON * cry, U32_ZERO)
    return sl, sh


def sub(al, ah, bl, bh):
    """Field subtraction of non-canonical elements (result non-canonical).
    Symmetric to `add`: each borrow folds as −EPSILON, twice."""
    dl, dh, brw = sub64(al, ah, bl, bh)
    dl, dh, brw = sub64(dl, dh, EPSILON * brw, U32_ZERO)
    dl, dh, _ = sub64(dl, dh, EPSILON * brw, U32_ZERO)
    return dl, dh


def neg(al, ah):
    zl = jnp.zeros_like(al)
    return sub(zl, zl, *canonicalize(al, ah))


def mul(al, ah, bl, bh):
    """Field multiplication (inputs/outputs non-canonical in [0, 2^64))."""
    return reduce128(*mul64_wide(al, ah, bl, bh))


def sqr(al, ah):
    return mul(al, ah, al, ah)


def canonicalize(al, ah):
    """Fold a non-canonical element into [0, p)."""
    # subtract p iff value >= p
    _, _, brw = sub64(al, ah, P_LO, P_HI)
    ge = (brw == 0)
    dl, dh, _ = sub64(al, ah, P_LO, P_HI)
    return jnp.where(ge, dl, al), jnp.where(ge, dh, ah)


def eq(al, ah, bl, bh):
    cal, cah = canonicalize(al, ah)
    cbl, cbh = canonicalize(bl, bh)
    return (cal == cbl) & (cah == cbh)


def mul_small(al, ah, k: int):
    """Multiply by a small uint32 constant k (k < 2^32)."""
    kk = jnp.uint32(k)
    p0l, p0h = mul32(al, kk)
    p1l, p1h = mul32(ah, kk)
    # 128-bit limbs: r0 = p0l, r1 = p0h + p1l (carry to r2), r2 = p1h + c
    r1 = p0h + p1l
    c = (r1 < p0h).astype(jnp.uint32)
    r2 = p1h + c
    return reduce128(p0l, r1, r2, jnp.zeros_like(r2))


def pow_const(al, ah, e: int):
    """Raise to a fixed Python-int power (square-and-multiply, unrolled)."""
    rl = jnp.ones_like(al)
    rh = jnp.zeros_like(ah)
    bl, bh = al, ah
    while e > 0:
        if e & 1:
            rl, rh = mul(rl, rh, bl, bh)
        e >>= 1
        if e:
            bl, bh = sqr(bl, bh)
    return rl, rh


_INV_EXP_BITS = None


@jax.jit
def inv(al, ah):
    """Batched modular inverse via Fermat: a^(p-2).  inv(0) = 0.

    Square-and-multiply under lax.fori_loop (64 iterations, 2-mul body):
    unrolling the chain triggers the XLA:CPU super-linear compile blowup.
    """
    global _INV_EXP_BITS
    import numpy as np

    if _INV_EXP_BITS is None:
        e = P - 2
        _INV_EXP_BITS = np.array([(e >> i) & 1 for i in range(64)],
                                 dtype=np.uint32)
    bits = jnp.asarray(_INV_EXP_BITS)

    def body(i, st):
        rl, rh, bl, bh = st
        do = jnp.take(bits, i)
        ml, mh = mul(rl, rh, bl, bh)
        rl = jnp.where(do == 1, ml, rl)
        rh = jnp.where(do == 1, mh, rh)
        bl, bh = sqr(bl, bh)
        return (rl, rh, bl, bh)

    rl = jnp.ones_like(al)
    rh = jnp.zeros_like(ah)
    rl, rh, _, _ = jax.lax.fori_loop(0, 64, body, (rl, rh, al, ah))
    return rl, rh


def from_u64(x) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build (lo, hi) from a numpy/python array of Python ints or uint64.

    Zero-copy limb split: a uint64 array IS its uint32 limb pairs in memory,
    so view + stride instead of mask/shift/astype (which costs four full
    passes over multi-hundred-MB traces before the device ever sees them).
    """
    import sys

    import numpy as np

    arr = np.ascontiguousarray(np.asarray(x, dtype=np.uint64))
    pairs = arr.view(np.uint32).reshape(arr.shape + (2,))
    lo_ix = 0 if sys.byteorder == "little" else 1
    return jnp.asarray(pairs[..., lo_ix]), jnp.asarray(pairs[..., 1 - lo_ix])


def to_u64(al, ah):
    """Return canonical values as a numpy uint64 array (host-side)."""
    import numpy as np

    cal, cah = canonicalize(al, ah)
    lo = np.asarray(jax.device_get(cal), dtype=np.uint64)
    hi = np.asarray(jax.device_get(cah), dtype=np.uint64)
    return lo | (hi << np.uint64(32))


def zeros(shape):
    return jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32)


def ones(shape):
    return jnp.ones(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32)


def full(shape, value: int):
    value %= P
    return (jnp.full(shape, value & 0xFFFFFFFF, jnp.uint32),
            jnp.full(shape, value >> 32, jnp.uint32))
