"""Device-batched ed25519: limb field arithmetic, point ops, and the
randomized aggregate batch verification vs the host reference."""

import numpy as np
import pytest

from vectorx_tpu.curves import ed25519 as host
from vectorx_tpu.curves import ed25519_batch as dev

Q = host.Q
RNG = np.random.default_rng(8)


def rand_field(n):
    return [int.from_bytes(RNG.bytes(32), "little") % Q for _ in range(n)]


def test_field_mul_add_sub():
    xs = rand_field(32) + [0, 1, Q - 1, Q - 2, (1 << 255) - 20]
    ys = rand_field(32) + [Q - 1, 0, Q - 1, 2, 37]
    a = dev.from_ints(xs)
    b = dev.from_ints(ys)
    got_mul = dev.to_ints(dev.canonical(dev.mul(a, b)))
    got_add = dev.to_ints(dev.canonical(dev.add(a, b)))
    got_sub = dev.to_ints(dev.canonical(dev.sub(a, b)))
    for i, (x, y) in enumerate(zip(xs, ys)):
        assert got_mul[i] == (x * y) % Q, f"mul {i}"
        assert got_add[i] == (x + y) % Q, f"add {i}"
        assert got_sub[i] == (x - y) % Q, f"sub {i}"


def test_field_semireduced_chaining():
    # chains of ops must stay correct without intermediate canonicalization
    xs = rand_field(8)
    a = dev.from_ints(xs)
    acc = a
    expected = list(xs)
    for _ in range(5):
        acc = dev.mul(acc, a)
        acc = dev.add(acc, acc)
        expected = [((e * x) * 2) % Q for e, x in zip(expected, xs)]
    got = dev.to_ints(dev.canonical(acc))
    assert got == expected


def test_point_add_matches_host():
    p1 = host.scalar_mult(12345, host.B_POINT)
    p2 = host.scalar_mult(99999, host.B_POINT)
    expected = host.point_add(p1, p2)
    dp1 = tuple(dev.from_ints([c % Q]) for c in p1)
    dp2 = tuple(dev.from_ints([c % Q]) for c in p2)
    out = dev.point_add(dp1, dp2)
    ox, oy, oz, _ = [dev.to_ints(dev.canonical(c))[0] for c in out]
    ex, ey, ez, _ = [c % Q for c in expected]
    # projective equality
    assert (ox * ez - ex * oz) % Q == 0
    assert (oy * ez - ey * oz) % Q == 0


def test_scalar_mult_batched_matches_host():
    scalars = [1, 2, 7, 0xDEADBEEF, host.L - 1]
    pts = [host.scalar_mult(k + 1, host.B_POINT) for k in range(len(scalars))]
    bits = np.array([dev._bits_msb(s) for s in scalars], dtype=np.uint32)
    dp = tuple(dev.from_ints([p[i] % Q for p in pts]) for i in range(4))
    out = dev.scalar_mult_batched(np.asarray(bits), dp)
    for j, (s, p) in enumerate(zip(scalars, pts)):
        exp = host.scalar_mult(s, p)
        ox = dev.to_ints(dev.canonical(out[0][j]))[0]
        oy = dev.to_ints(dev.canonical(out[1][j]))[0]
        oz = dev.to_ints(dev.canonical(out[2][j]))[0]
        ex, ey, ez, _ = exp
        assert (ox * ez % Q) == (ex * oz % Q), f"X {j}"
        assert (oy * ez % Q) == (ey * oz % Q), f"Y {j}"


def _make_sigs(n, msg=b"vectorx batch"):
    sks = [bytes([i + 1]) * 32 for i in range(n)]
    pks = [host.public_key(sk) for sk in sks]
    sigs = [host.sign(sk, msg) for sk in sks]
    return pks, [msg] * n, sigs


def test_batch_verify_accepts_valid():
    pks, msgs, sigs = _make_sigs(6)
    assert dev.batch_verify(pks, msgs, sigs)


def test_batch_verify_rejects_forgery():
    pks, msgs, sigs = _make_sigs(6)
    bad = bytearray(sigs[3])
    bad[1] ^= 1
    sigs[3] = bytes(bad)
    assert not dev.batch_verify(pks, msgs, sigs)


def test_batch_verify_conditional_mask():
    pks, msgs, sigs = _make_sigs(6)
    sigs[2] = b"\x00" * 64  # garbage, but masked out
    mask = [True, True, False, True, True, True]
    assert dev.batch_verify(pks, msgs, sigs, signed_mask=mask)
    mask[2] = True
    assert not dev.batch_verify(pks, msgs, sigs, signed_mask=mask)


def test_justification_device_backend():
    from vectorx_tpu.circuits.justification import (JustificationError,
                                                    verify_simple_justification)
    from vectorx_tpu.io.fixtures import FixtureChain
    from vectorx_tpu.hash.sha256 import chained_hash

    chain = FixtureChain(seed=5, num_blocks=30, epoch_length=10,
                         authorities_per_era=lambda e: 5)
    j = chain.get_justification(17, max_authorities=8)
    verify_simple_justification(j, 17, chain.get_block_hash(17), 1,
                                chained_hash(chain.era_pubkeys(1)),
                                signature_backend="device")
    # forged signature must be caught by the batch equation
    sigs = list(j.signatures)
    sigs[0] = sigs[0][:32] + bytes(31) + b"\x01"
    j.signatures = sigs
    with pytest.raises(JustificationError):
        verify_simple_justification(j, 17, chain.get_block_hash(17), 1,
                                    chained_hash(chain.era_pubkeys(1)),
                                    signature_backend="device")
