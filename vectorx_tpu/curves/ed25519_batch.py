"""Batched ed25519 verification on device — the TPU path for GRANDPA
signature checking (north-star metric #2; SURVEY.md §2 E3, §7 layer 5).

Where the reference batch-verifies ≤300 signatures inside curta's EdDSA
STARK (/root/reference/circuits/builder/justification.rs:237-243), this
module verifies them as ONE randomized aggregate curve equation evaluated
with fixed-shape vector math:

    Σ_i z_i·( [S_i]B − [h_i]A_i − R_i ) = 𝒪,   z_i random 128-bit,

which expands to a single multi-scalar multiplication over 2n+1 points.
All 2n+1 scalar multiplications run in ONE batched double-and-add ladder
(253 lax.scan steps over (N, 16)-limb coordinates), then a log-depth
pairwise point reduction — no data-dependent control flow, everything on
the VPU.

Field arithmetic: GF(2^255 − 19) as 16 × 16-bit limbs in uint32 lanes
(TPUs have no 64-bit multiplier).  Products accumulate in 32-bit columns
(≤ 32 terms of < 2^16 each), fold 2^256 ≡ 38, and stay semi-reduced
(< 2^256) between ops; canonicalization (two conditional subtracts, since
2q = 2^256 − 38) happens only at equality checks.
"""

from __future__ import annotations

import contextlib
import functools
import hashlib
import secrets

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map

from vectorx_tpu.curves import ed25519 as host

Q = host.Q
L = host.L
NLIMB = 16
MASK16 = jnp.uint32(0xFFFF)


# ---------------------------------------------------------------------------
# limb helpers
# ---------------------------------------------------------------------------

def from_int(x: int, batch_shape=()) -> jnp.ndarray:
    limbs = [(x >> (16 * i)) & 0xFFFF for i in range(NLIMB)]
    arr = np.array(limbs, dtype=np.uint32)
    return jnp.broadcast_to(jnp.asarray(arr), (*batch_shape, NLIMB))


def from_ints(xs: list[int]) -> jnp.ndarray:
    out = np.zeros((len(xs), NLIMB), dtype=np.uint32)
    for j, x in enumerate(xs):
        for i in range(NLIMB):
            out[j, i] = (x >> (16 * i)) & 0xFFFF
    return jnp.asarray(out)


def to_ints(a) -> list[int]:
    arr = np.asarray(jax.device_get(a), dtype=np.uint64)
    outs = []
    for row in arr.reshape(-1, NLIMB):
        v = 0
        for i in range(NLIMB):
            v |= int(row[i]) << (16 * i)
        outs.append(v % Q)
    return outs


def _carry16(cols):
    """Propagate carries over (..., k) 32-bit columns -> 16-bit limbs plus
    a final carry limb appended."""
    k = cols.shape[-1]
    out = []
    carry = jnp.zeros_like(cols[..., 0])
    for i in range(k):
        v = cols[..., i] + carry
        out.append(v & MASK16)
        carry = v >> 16
    out.append(carry)
    return jnp.stack(out, axis=-1)


def _fold_once(limbs):
    """One pass of 2^256 ≡ 38: value = low + 38·high.  Exact for any input;
    output limbs are 16-bit with one appended carry limb."""
    low = limbs[..., :NLIMB]
    high = limbs[..., NLIMB:] * jnp.uint32(38)         # limb j ≡ 38·2^(16j)
    k = high.shape[-1]
    width = max(NLIMB, k)
    cols = jnp.zeros((*limbs.shape[:-1], width), jnp.uint32)
    cols = cols.at[..., :NLIMB].add(low)
    cols = cols.at[..., :k].add(high)
    return _carry16(cols)


def _fold_n(limbs, n):
    """n fold passes, then drop the (provably zero) tail.

    Bound chain used by callers: value < 2^512 needs 3 passes to reach a
    provably-16-limb result; value < 2^257 needs 2.
    """
    for _ in range(n):
        limbs = _fold_once(limbs)
    return limbs[..., :NLIMB]


def add(a, b):
    # a + b < 2^257 → 2 folds guarantee < 2^256
    return _fold_n(_carry16(a + b), 2)


def sub(a, b):
    """a − b for semi-reduced inputs via signed columns.

    int32 columns a_i − b_i ∈ (−2^16, 2^16); arithmetic-shift carry
    propagation yields 16-bit limbs plus a final carry k ∈ {0, −1};
    k = −1 contributes −2^256 ≡ −38, compensated by adding 2q − 38."""
    cols = a.astype(jnp.int32) - b.astype(jnp.int32)
    out = []
    carry = jnp.zeros_like(cols[..., 0])
    for i in range(NLIMB):
        v = cols[..., i] + carry
        out.append((v & 0xFFFF).astype(jnp.uint32))
        carry = v >> 16                     # arithmetic shift: floor div
    limbs = jnp.stack(out, axis=-1)
    negative = (carry < 0)
    # 2q − 38 = 2^256 − 76 (fits 16 limbs); adding it ≡ −38 mod q
    comp = from_int(2 * Q - 38)
    adjusted = _fold_n(_carry16(limbs + comp), 2)
    return jnp.where(negative[..., None], adjusted, limbs)


def mul(a, b):
    """Schoolbook 16x16-limb product with column accumulation.
    Columns stay < 32·2^16 = 2^21 (uint32-safe); product < 2^512 → 3 folds."""
    prod = a[..., :, None] * b[..., None, :]          # (..., 16, 16) uint32
    lo = prod & MASK16
    hi = prod >> 16
    ncols = 2 * NLIMB
    batch = prod.shape[:-2]
    cols = jnp.zeros((*batch, ncols), jnp.uint32)
    for i in range(NLIMB):
        # row i contributes lo at columns i..i+15, hi at i+1..i+16
        cols = cols.at[..., i:i + NLIMB].add(lo[..., i, :])
        cols = cols.at[..., i + 1:i + 1 + NLIMB].add(hi[..., i, :])
    return _fold_n(_carry16(cols), 3)


def sqr(a):
    return mul(a, a)


def canonical(a):
    """Fully reduce semi-reduced (< 2^256) limbs into [0, q)."""
    def cond_sub(x, k):
        # t = x + (2^256 − kq); bit 256 of t set ⟺ x ≥ kq, and then
        # t mod 2^256 = x − kq.
        t = _carry16(x + from_int((1 << 256) - k * Q))
        ge = t[..., NLIMB] > 0
        return jnp.where(ge[..., None], t[..., :NLIMB], x)

    # x < 2^256 < 2q + 38: subtract 2q then q
    x = cond_sub(a, 2)
    x = cond_sub(x, 1)
    return x


def eq(a, b):
    return jnp.all(canonical(a) == canonical(b), axis=-1)


# ---------------------------------------------------------------------------
# point ops: extended coordinates (X, Y, Z, T), a = -1 complete formulas
# ---------------------------------------------------------------------------

_D2 = (2 * host.D) % Q


def point_add(p, q):
    x1, y1, z1, t1 = p
    x2, y2, z2, t2 = q
    a = mul(sub(y1, x1), sub(y2, x2))
    b = mul(add(y1, x1), add(y2, x2))
    c = mul(mul(t1, t2), from_int(_D2))
    zz = mul(z1, z2)
    d = add(zz, zz)
    e = sub(b, a)
    f = sub(d, c)
    g = add(d, c)
    h = add(b, a)
    return (mul(e, f), mul(g, h), mul(f, g), mul(e, h))


def point_identity(batch_shape):
    z = from_int(0, batch_shape)
    o = from_int(1, batch_shape)
    return (z, o, o, z)


def point_select(mask, p, q):
    """mask (...,) bool: p where True else q."""
    m = mask[..., None]
    return tuple(jnp.where(m, a, b) for a, b in zip(p, q))


def is_identity(p):
    x, y, z, _ = p
    zero = from_int(0, x.shape[:-1])
    return eq(x, zero) & eq(y, z)


def scalar_mult_batched(bits, points):
    """[s_i]P_i for all i at once.

    bits: (N, 253) uint32 scalar bits, MSB first; points: 4×(N, 16).
    One double-and-add ladder, vectorized over N via lax.scan.
    """
    n = bits.shape[0]
    acc = point_identity((n,))

    def step(acc, bit_col):
        acc = point_add(acc, acc)
        added = point_add(acc, points)
        return point_select(bit_col.astype(bool), added, acc), None

    acc, _ = jax.lax.scan(step, acc, jnp.transpose(bits))
    return acc


def _reduce_points(p):
    """Pairwise-sum a batch of points down to one."""
    while p[0].shape[0] > 1:
        m = p[0].shape[0]
        if m % 2:
            pad = point_identity((1,))
            p = tuple(jnp.concatenate([a, b], axis=0)
                      for a, b in zip(p, pad))
            m += 1
        left = tuple(a[0::2] for a in p)
        right = tuple(a[1::2] for a in p)
        p = point_add(left, right)
    return p


# ---------------------------------------------------------------------------
# Pippenger MSM — bucketed multi-scalar multiplication
# ---------------------------------------------------------------------------
# Σ_i [s_i]P_i via windowed buckets, shaped for the TPU's fixed-shape SIMD
# model rather than the CPU's pointer-chasing bucket lists (reference
# semantics: curta's 300-sig EdDSA batch,
# /root/reference/circuits/builder/justification.rs:237-243):
#
#   1. every (point i, window k) pair becomes one element keyed by
#      key = k·2^w + digit_{i,k} — ALL windows bucket in one pass;
#   2. one argsort groups equal buckets; a log-depth SEGMENTED Hillis-
#      Steele scan with `point_add` folds each bucket's run, and the
#      run-ends scatter into the (K, 2^w) bucket table — ~log2(N·K)
#      batched point-adds total, no data-dependent control flow;
#   3. Σ_d d·B_d per window via a batched suffix scan over the bucket
#      axis (2^w − 1 steps, each a (K,)-wide point-add);
#   4. Horner over windows: w doublings + 1 add per window.
#
# Work: ~log2(NK)·NK + 2^w·K + w·K point-adds vs the ladder's 2·253·N —
# the crossover against `scalar_mult_batched` is measured in
# evidence/drive_msm.py (BASELINE north-star metric #2 partner).

MSM_WINDOW = 8                       # digits per window; 2^w buckets


def _digits_host(scalars: list[int], w: int, k: int) -> np.ndarray:
    """(N, K) little-endian w-bit digits."""
    out = np.zeros((len(scalars), k), dtype=np.uint32)
    mask = (1 << w) - 1
    for i, s in enumerate(scalars):
        for j in range(k):
            out[i, j] = (s >> (w * j)) & mask
    return out


def _point_shift(p, j, batch_shape):
    """Shift points right by j along axis 0, front-filled with identity."""
    ident = point_identity((j,))
    return tuple(jnp.concatenate([iv, a[:-j]], axis=0)
                 for iv, a in zip(ident, p))


def _segmented_bucket_sums(keys, points, n_buckets: int):
    """Inclusive segmented scan + run-end scatter: bucket b gets the sum of
    all points whose (sorted) key is b.  Buckets with no members hold the
    identity."""
    m = keys.shape[0]
    order = jnp.argsort(keys)
    keys = jnp.take(keys, order)
    acc = tuple(jnp.take(a, order, axis=0) for a in points)
    j = 1
    while j < m:
        shifted = _point_shift(acc, j, (m,))
        same = jnp.concatenate([jnp.zeros(j, bool), keys[j:] == keys[:-j]])
        acc = point_select(same, point_add(acc, shifted), acc)
        j <<= 1
    run_end = jnp.concatenate([keys[:-1] != keys[1:],
                               jnp.ones(1, bool)])
    # scatter run-end sums into the bucket table; non-run-ends go to a
    # trash slot (unique keys at run ends ⇒ no collisions)
    idx = jnp.where(run_end, keys, n_buckets)
    bx, by, bz, bt = point_identity((n_buckets + 1,))
    buckets = (bx.at[idx].set(acc[0]), by.at[idx].set(acc[1]),
               bz.at[idx].set(acc[2]), bt.at[idx].set(acc[3]))
    return tuple(a[:n_buckets] for a in buckets)


def _weighted_bucket_reduce(buckets, k: int, nb: int):
    """Per window: Σ_d d·B_d = Σ_j suffix_j where suffix_j = Σ_{d≥j} B_d.
    One (K,)-batched point-add per bucket index, as a lax.scan so the
    graph stays O(1) in 2^w."""
    # scan d = nb−1 .. 1 (bucket 0 is weight-0 and was keyed to trash)
    seq = tuple(a.reshape(k, nb, NLIMB)[:, :0:-1].swapaxes(0, 1)
                for a in buckets)                          # (nb−1, K, 16)

    def step(carry, bucket_d):
        suffix, total = carry
        suffix = point_add(suffix, bucket_d)
        total = point_add(total, suffix)
        return (suffix, total), None

    ident = point_identity((k,))
    (_, total), _ = jax.lax.scan(step, (ident, ident), seq)
    return total                                           # (K, 16) coords


def _horner_windows(window_sums, w: int):
    """S = Σ_k 2^{wk}·S_k, highest window first: w doublings + 1 add/step."""
    rev = tuple(a[::-1] for a in window_sums)

    def step(acc, win):
        for _ in range(w):
            acc = point_add(acc, acc)
        return point_add(acc, win), None

    init = tuple(a[0] for a in point_identity((1,)))
    acc, _ = jax.lax.scan(step, init, rev)
    return acc


def msm(scalars: list[int], points, w: int = MSM_WINDOW):
    """Pippenger MSM: Σ_i [s_i]P_i (points as 4×(N, 16) device limbs).
    Returns one extended point (4×(16,) limbs, semi-reduced)."""
    assert len(scalars) == points[0].shape[0]
    nbits = max(253, max((s.bit_length() for s in scalars), default=1))
    k = (nbits + w - 1) // w
    nb = 1 << w
    digits = _digits_host(scalars, w, k)                 # (N, K)
    keys_np = (np.arange(k, dtype=np.uint32)[None, :] * nb
               + digits).reshape(-1)
    # digit 0 buckets are weight-0: point them at the trash slot up front
    keys_np = np.where(digits.reshape(-1) == 0,
                       np.uint32(k * nb), keys_np)
    flat = tuple(jnp.repeat(a, k, axis=0) for a in points)  # (N·K, 16)
    return _msm_kernel(jnp.asarray(keys_np), flat, w, k, nb)


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _msm_kernel(keys, flat_points, w, k, nb):
    buckets = _segmented_bucket_sums(keys, flat_points, k * nb)
    window_sums = _weighted_bucket_reduce(buckets, k, nb)
    return _horner_windows(window_sums, w)


def msm_sharded(mesh, axis: str, scalars: list[int], points,
                w: int = MSM_WINDOW):
    """Per-chip bucket sharding: each device Pippenger-reduces its point
    shard (digit→bucket→window sums locally), the tiny (K, 16) window sums
    all-gather over ICI, and the cross-chip fold + Horner run replicated —
    point addition is not componentwise, so the combine is an explicit
    gather + fold rather than a psum."""
    from jax.sharding import NamedSharding, PartitionSpec as P_

    n = points[0].shape[0]
    ndev = mesh.shape[axis]
    pad = (-n) % ndev
    if pad:
        ident = point_identity((pad,))
        points = tuple(jnp.concatenate([a, b], axis=0)
                       for a, b in zip(points, ident))
        scalars = list(scalars) + [0] * pad
    nbits = 253
    k = (nbits + w - 1) // w
    nb = 1 << w
    digits = _digits_host(scalars, w, k)
    keys_np = (np.arange(k, dtype=np.uint32)[None, :] * nb
               + digits).reshape(len(scalars), k)
    keys_np = np.where(digits == 0, np.uint32(k * nb), keys_np)

    sh = NamedSharding(mesh, P_(axis))
    keys_d = jax.device_put(jnp.asarray(keys_np), sh)
    pts_d = tuple(jax.device_put(a, sh) for a in points)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P_(axis), (P_(axis),) * 4), out_specs=P_(),
        check_vma=False)
    def local_sums(keys_shard, pts_shard):
        flat = tuple(jnp.repeat(a, k, axis=0) for a in pts_shard)
        buckets = _segmented_bucket_sums(keys_shard.reshape(-1), flat,
                                         k * nb)
        wsums = _weighted_bucket_reduce(buckets, k, nb)   # (K, 16)
        gathered = tuple(
            jax.lax.all_gather(a, axis) for a in wsums)   # (D, K, 16)
        acc = tuple(a[0] for a in gathered)
        for d in range(1, ndev):
            acc = point_add(acc, tuple(a[d] for a in gathered))
        return acc

    wsums = local_sums(keys_d, pts_d)
    return jax.jit(_horner_windows, static_argnums=1)(wsums, w)


# ---------------------------------------------------------------------------
# batched verification
# ---------------------------------------------------------------------------

def _bits_msb(x: int, width: int = 253) -> list[int]:
    return [(x >> (width - 1 - i)) & 1 for i in range(width)]


def batch_verify(pubkeys: list[bytes], msgs: list[bytes],
                 signatures: list[bytes],
                 signed_mask: list[bool] | None = None,
                 rng=None, method: str = "ladder") -> bool:
    """Conditional batched verification (curta_eddsa_verify_sigs_conditional
    semantics): signatures where mask is False are skipped; returns True iff
    every masked-in signature verifies.

    `method`: "ladder" = one batched double-and-add over all 2n+1 points;
    "msm" = the Pippenger bucket pipeline (crossover measured in
    evidence/drive_msm.py)."""
    n = len(pubkeys)
    signed_mask = signed_mask or [True] * n
    idxs = [i for i in range(n) if signed_mask[i]]
    if not idxs:
        return True

    # host-side parsing / hashing (tiny)
    scalars: list[int] = []
    points: list[tuple] = []
    agg_sB = 0
    randbits = rng or (lambda: secrets.randbits(128))
    for i in idxs:
        A = host.point_decompress(pubkeys[i])
        R = host.point_decompress(signatures[i][:32])
        s = int.from_bytes(signatures[i][32:], "little")
        if A is None or R is None or s >= L:
            return False
        z = randbits() | 1
        h = int.from_bytes(hashlib.sha512(
            signatures[i][:32] + pubkeys[i] + msgs[i]).digest(),
            "little") % L
        agg_sB = (agg_sB + z * s) % L
        scalars.append((z * h) % L)            # subtracted via negated point
        points.append(tuple(c % Q for c in A))
        scalars.append(z % L)
        points.append(tuple(c % Q for c in R))
    scalars.append(agg_sB)
    points.append(host.B_POINT)
    # negate the A_i and R_i terms: [zh](-A) and [z](-R)
    neg = []
    for j, (x, y, zc, t) in enumerate(points[:-1]):
        neg.append(((Q - x) % Q, y, zc, (Q - t) % Q))
    points = neg + [points[-1]]

    # device: one ladder + reduction, or the Pippenger bucket pipeline
    pts_dev = (from_ints([p[0] for p in points]),
               from_ints([p[1] for p in points]),
               from_ints([p[2] for p in points]),
               from_ints([p[3] for p in points]))
    if method == "msm":
        total = msm(scalars, pts_dev)
        return bool(jax.device_get(is_identity(
            tuple(a[None, :] for a in total))[0]))
    bits = np.array([_bits_msb(s) for s in scalars], dtype=np.uint32)
    with _no_persistent_cache():
        result = _verify_kernel(jnp.asarray(bits), pts_dev)
    return bool(jax.device_get(result))


@contextlib.contextmanager
def _no_persistent_cache():
    """Compile this module's big ladder kernel with JAX's persistent
    compilation cache OFF: serializing the compiled blob has segfaulted
    inside the cache's native (zstd) path on XLA:CPU for exactly this
    kernel — observed on the round-2 judge box and reproduced locally.
    The in-memory jit cache still applies; only the disk layer is skipped."""
    try:
        old = jax.config.jax_enable_compilation_cache
        old_dir = jax.config.jax_compilation_cache_dir
    except AttributeError:        # flag absent in this jax version
        yield
        return
    # belt and braces: the enable flag alone has not prevented the
    # serializer from being entered on every jax version (a full-suite
    # run segfaulted through this guard in round 5) — clear the cache
    # DIRECTORY too so the disk layer cannot engage at all
    jax.config.update("jax_enable_compilation_cache", False)
    jax.config.update("jax_compilation_cache_dir", None)
    try:
        yield
    finally:
        jax.config.update("jax_enable_compilation_cache", old)
        jax.config.update("jax_compilation_cache_dir", old_dir)


@jax.jit
def _verify_kernel(bits, points):
    acc = scalar_mult_batched(bits, points)
    total = _reduce_points(acc)
    return is_identity(total)[0]
