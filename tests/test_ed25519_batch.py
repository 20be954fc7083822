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


@pytest.mark.slow
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


@pytest.mark.slow
def test_batch_verify_conditional_mask():
    pks, msgs, sigs = _make_sigs(6)
    sigs[2] = b"\x00" * 64  # garbage, but masked out
    mask = [True, True, False, True, True, True]
    assert dev.batch_verify(pks, msgs, sigs, signed_mask=mask)
    mask[2] = True
    assert not dev.batch_verify(pks, msgs, sigs, signed_mask=mask)


@pytest.mark.slow
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


@pytest.mark.slow
def test_msm_matches_host_oracle():
    """Pippenger MSM == host Σ[s_i]P_i (small window keeps the CPU-test
    compile cheap; the window size only re-buckets, never changes math)."""
    import numpy as np

    from vectorx_tpu.curves import ed25519 as host

    rng = np.random.default_rng(5)
    n = 5
    scalars = [int.from_bytes(rng.bytes(32), "little") % host.L
               for _ in range(n)]
    scalars[0] = 0                      # weight-0 digits everywhere
    pts = [host.scalar_mult(int(rng.integers(1, 1 << 30)), host.B_POINT)
           for _ in range(n)]
    acc = (0, 1, 1, 0)
    for s, p in zip(scalars, pts):
        acc = host.point_add(acc, host.scalar_mult(s, p))
    want = host.point_compress(acc)

    pts_dev = tuple(dev.from_ints([p[c] for p in pts]) for c in range(4))
    got = dev.msm(scalars, pts_dev, w=4)
    x, y, z, _t = [dev.to_ints(a[None, :])[0] for a in got]
    zi = pow(z, host.Q - 2, host.Q)
    gx, gy = x * zi % host.Q, y * zi % host.Q
    assert host.point_compress((gx, gy, 1, gx * gy % host.Q)) == want


@pytest.mark.slow
def test_batch_verify_msm_method():
    pks, msgs, sigs = _make_sigs(4)
    import vectorx_tpu.curves.ed25519_batch as eb

    old = eb.MSM_WINDOW
    eb.MSM_WINDOW = 4                   # small buckets: cheap CPU compile
    try:
        assert dev.batch_verify(pks, msgs, sigs, method="msm")
        bad = list(sigs)
        bad[1] = bad[1][:32] + bytes(31) + b"\x01"
        assert not dev.batch_verify(pks, msgs, bad, method="msm")
    finally:
        eb.MSM_WINDOW = old


@pytest.mark.slow
def test_msm_sharded_matches_single_device():
    """Per-chip bucket sharding over the test mesh == unsharded MSM."""
    import jax
    import numpy as np

    from jax.sharding import Mesh

    from vectorx_tpu.curves import ed25519 as host

    if len(jax.devices()) < 2:
        import pytest as _pytest

        _pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.array(jax.devices()[:2]), ("pts",))
    rng = np.random.default_rng(9)
    n = 6
    scalars = [int.from_bytes(rng.bytes(32), "little") % host.L
               for _ in range(n)]
    pts = [host.scalar_mult(int(rng.integers(1, 1 << 30)), host.B_POINT)
           for _ in range(n)]
    pts_dev = tuple(dev.from_ints([p[c] for p in pts]) for c in range(4))
    single = dev.msm(scalars, pts_dev, w=4)
    sharded = dev.msm_sharded(mesh, "pts", scalars, pts_dev, w=4)
    sx = dev.to_ints(single[0][None, :])[0], dev.to_ints(single[1][None, :])[0], dev.to_ints(single[2][None, :])[0]
    hx = dev.to_ints(sharded[0][None, :])[0], dev.to_ints(sharded[1][None, :])[0], dev.to_ints(sharded[2][None, :])[0]

    def affine(x, y, z):
        zi = pow(z, host.Q - 2, host.Q)
        return x * zi % host.Q, y * zi % host.Q

    assert affine(*sx) == affine(*hx)
