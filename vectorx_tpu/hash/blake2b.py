"""Blake2b-256 — batched variable-length device kernel + host reference.

Role: Avail header hashing.  The reference circuits hash every encoded
header with a variable-length Blake2b gadget over up to 280 128-byte chunks
(`hash_encoded_header` → `curta_blake2b_variable`,
/root/reference/circuits/builder/header.rs:13-20, consts.rs:9-16).  Here a
batch of headers (each with its own byte length, zero-padded to a shared
maximum) is hashed in one fixed-shape device computation: every row runs the
same `max_blocks` compression iterations with per-row masks selecting the
correct counter/finalization — the same fixed-shape-with-masking discipline
the circuits use (SURVEY.md §5 "fixed-shape mask-and-reduce").

64-bit words are (lo, hi) uint32 lane pairs (TPUs have no native u64).
Host path: hashlib.blake2b (C).
"""

from __future__ import annotations

import functools
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

_IV = np.array([
    0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
    0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
    0x1f83d9abfb41bd6b, 0x5be0cd19137e2179], dtype=np.uint64)

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
]


def _add64(al, ah, bl, bh):
    sl = al + bl
    c = (sl < al).astype(jnp.uint32)
    return sl, ah + bh + c


def _xor64(al, ah, bl, bh):
    return al ^ bl, ah ^ bh


def _rotr64(al, ah, r):
    if r == 32:
        return ah, al
    if r < 32:
        lo = (al >> r) | (ah << (32 - r))
        hi = (ah >> r) | (al << (32 - r))
        return lo, hi
    # r in (32, 64): rotr r = rotr (r-32) of the swapped pair
    r -= 32
    lo = (ah >> r) | (al << (32 - r))
    hi = (al >> r) | (ah << (32 - r))
    return lo, hi


# Per-round message-word index tables for the vectorized 4-lane G phases:
# column phase uses (x, y) = m[sigma[0:8:2]], m[sigma[1:8:2]];
# diagonal phase uses m[sigma[8:16:2]], m[sigma[9:16:2]].
_SIG_CX = np.array([s[0:8:2] for s in _SIGMA], dtype=np.int32)
_SIG_CY = np.array([s[1:8:2] for s in _SIGMA], dtype=np.int32)
_SIG_DX = np.array([s[8:16:2] for s in _SIGMA], dtype=np.int32)
_SIG_DY = np.array([s[9:16:2] for s in _SIGMA], dtype=np.int32)


def _g4(a, b, c, d, x, y):
    """Four G functions in parallel on (B, 4) 64-bit lanes."""
    al, ah = a
    bl, bh = b
    cl, ch = c
    dl, dh = d
    xl, xh = x
    yl, yh = y
    al, ah = _add64(*_add64(al, ah, bl, bh), xl, xh)
    dl, dh = _rotr64(*_xor64(dl, dh, al, ah), 32)
    cl, ch = _add64(cl, ch, dl, dh)
    bl, bh = _rotr64(*_xor64(bl, bh, cl, ch), 24)
    al, ah = _add64(*_add64(al, ah, bl, bh), yl, yh)
    dl, dh = _rotr64(*_xor64(dl, dh, al, ah), 16)
    cl, ch = _add64(cl, ch, dl, dh)
    bl, bh = _rotr64(*_xor64(bl, bh, cl, ch), 63)
    return (al, ah), (bl, bh), (cl, ch), (dl, dh)


def _compress_body(hl, hh, ml, mh, t_lo, is_last):
    """One Blake2b compression, vectorized over the batch.

    hl/hh: (B, 8) state; ml/mh: (B, 16) message words; t_lo: (B,) byte
    counter (< 2^32 for our 35KB-max inputs); is_last: (B,) uint32 0/1.

    The 12 rounds run under lax.fori_loop (unrolling them blows up XLA:CPU
    compile time super-linearly); within a round the 4 column G's and 4
    diagonal G's run as (B, 4)-lane vector ops with rolls for the diagonal.
    """
    B = hl.shape[0]
    ivl = jnp.broadcast_to(
        jnp.asarray((_IV & np.uint64(0xFFFFFFFF)).astype(np.uint32)), (B, 8))
    ivh = jnp.broadcast_to(
        jnp.asarray((_IV >> np.uint64(32)).astype(np.uint32)), (B, 8))
    vl = jnp.concatenate([hl, ivl], axis=1)
    vh = jnp.concatenate([hh, ivh], axis=1)
    # counter (t_hi = 0 for our <2^32-byte inputs) and finalization flag
    vl = vl.at[:, 12].set(vl[:, 12] ^ t_lo)
    f0 = jnp.uint32(0xFFFFFFFF) * is_last
    vl = vl.at[:, 14].set(vl[:, 14] ^ f0)
    vh = vh.at[:, 14].set(vh[:, 14] ^ f0)

    sig = (jnp.asarray(_SIG_CX), jnp.asarray(_SIG_CY),
           jnp.asarray(_SIG_DX), jnp.asarray(_SIG_DY))

    def round_body(r, v):
        vl, vh = v
        cx, cy, dx, dy = (jnp.take(s, r, axis=0) for s in sig)
        mx = (jnp.take(ml, cx, axis=1), jnp.take(mh, cx, axis=1))
        my = (jnp.take(ml, cy, axis=1), jnp.take(mh, cy, axis=1))
        a = (vl[:, 0:4], vh[:, 0:4])
        b = (vl[:, 4:8], vh[:, 4:8])
        c = (vl[:, 8:12], vh[:, 8:12])
        d = (vl[:, 12:16], vh[:, 12:16])
        a, b, c, d = _g4(a, b, c, d, mx, my)
        # diagonalize: rotate lanes b by 1, c by 2, d by 3
        b = (jnp.roll(b[0], -1, axis=1), jnp.roll(b[1], -1, axis=1))
        c = (jnp.roll(c[0], -2, axis=1), jnp.roll(c[1], -2, axis=1))
        d = (jnp.roll(d[0], -3, axis=1), jnp.roll(d[1], -3, axis=1))
        mx = (jnp.take(ml, dx, axis=1), jnp.take(mh, dx, axis=1))
        my = (jnp.take(ml, dy, axis=1), jnp.take(mh, dy, axis=1))
        a, b, c, d = _g4(a, b, c, d, mx, my)
        # un-diagonalize
        b = (jnp.roll(b[0], 1, axis=1), jnp.roll(b[1], 1, axis=1))
        c = (jnp.roll(c[0], 2, axis=1), jnp.roll(c[1], 2, axis=1))
        d = (jnp.roll(d[0], 3, axis=1), jnp.roll(d[1], 3, axis=1))
        vl = jnp.concatenate([a[0], b[0], c[0], d[0]], axis=1)
        vh = jnp.concatenate([a[1], b[1], c[1], d[1]], axis=1)
        return (vl, vh)

    vl, vh = jax.lax.fori_loop(0, 12, round_body, (vl, vh))
    out_l = hl ^ vl[:, 0:8] ^ vl[:, 8:16]
    out_h = hh ^ vh[:, 0:8] ^ vh[:, 8:16]
    return out_l, out_h


@functools.lru_cache(maxsize=None)
def _h0(digest_size: int):
    h = _IV.copy()
    h[0] ^= np.uint64(0x01010000 ^ digest_size)
    return h


@jax.jit
def _run_blocks(hl, hh, wl, wh, lengths, nblocks):
    """Scan the per-row masked compression over all blocks in one jit.

    wl/wh: (B, max_blocks, 16); lengths/nblocks: (B,) uint32.
    """
    max_blocks = wl.shape[1]

    def step(carry, b):
        hl, hh = carry
        in_range = (b < nblocks).astype(jnp.uint32)
        is_last = (b == nblocks - 1).astype(jnp.uint32)
        t_full = jnp.minimum((b + 1) * jnp.uint32(128), lengths)
        mlb = jax.lax.dynamic_index_in_dim(wl, b, axis=1, keepdims=False)
        mhb = jax.lax.dynamic_index_in_dim(wh, b, axis=1, keepdims=False)
        nhl, nhh = _compress_body(hl, hh, mlb, mhb, t_full, is_last)
        keep = in_range[:, None]
        return (jnp.where(keep == 1, nhl, hl),
                jnp.where(keep == 1, nhh, hh)), None

    (hl, hh), _ = jax.lax.scan(step, (hl, hh),
                               jnp.arange(max_blocks, dtype=jnp.uint32))
    return hl, hh


def blake2b_batch(msgs: np.ndarray, lengths: np.ndarray,
                  digest_size: int = 32) -> np.ndarray:
    """Blake2b of a batch of variable-length messages in fixed shape.

    msgs: (B, max_len) uint8, zero-padded; lengths: (B,) actual byte counts.
    Every row runs the same max_blocks compressions; per-row masks pick the
    right counter and final-block flag, and out-of-range blocks leave the
    state unchanged.  Returns (B, digest_size) uint8.
    """
    B, max_len = msgs.shape
    max_blocks = max(1, (max_len + 127) // 128)
    pad_len = max_blocks * 128
    buf = np.zeros((B, pad_len), dtype=np.uint8)
    buf[:, :max_len] = msgs
    # Blake2b pads with zeros: mask any caller garbage past each row's
    # length so the digest depends only on the first `lengths[i]` bytes
    # (silent corruption otherwise — found by a boundary drive).
    lengths = np.asarray(lengths, dtype=np.uint32)
    buf[np.arange(pad_len, dtype=np.uint32)[None, :] >= lengths[:, None]] = 0
    # little-endian 64-bit words: (B, max_blocks, 16)
    w = buf.reshape(B, max_blocks, 16, 8)
    wl = (w[..., 0].astype(np.uint32) | (w[..., 1].astype(np.uint32) << 8)
          | (w[..., 2].astype(np.uint32) << 16)
          | (w[..., 3].astype(np.uint32) << 24))
    wh = (w[..., 4].astype(np.uint32) | (w[..., 5].astype(np.uint32) << 8)
          | (w[..., 6].astype(np.uint32) << 16)
          | (w[..., 7].astype(np.uint32) << 24))

    nblocks = np.maximum(1, (lengths + 127) // 128).astype(np.uint32)

    h0 = _h0(digest_size)
    hl = jnp.broadcast_to(
        jnp.asarray((h0 & np.uint64(0xFFFFFFFF)).astype(np.uint32)), (B, 8))
    hh = jnp.broadcast_to(
        jnp.asarray((h0 >> np.uint64(32)).astype(np.uint32)), (B, 8))

    hl, hh = _run_blocks(hl, hh, jnp.asarray(wl), jnp.asarray(wh),
                         jnp.asarray(lengths), jnp.asarray(nblocks))

    ll = np.asarray(jax.device_get(hl), dtype=np.uint32)
    lh = np.asarray(jax.device_get(hh), dtype=np.uint32)
    out = np.zeros((B, 64), dtype=np.uint8)
    for i in range(8):
        for byte in range(4):
            out[:, 8 * i + byte] = (ll[:, i] >> (8 * byte)) & 0xFF
            out[:, 8 * i + 4 + byte] = (lh[:, i] >> (8 * byte)) & 0xFF
    return out[:, :digest_size]


def blake2b_256(data: bytes) -> bytes:
    """Host single-shot (hashlib) — the Avail header hash
    (`sp_core::Blake2Hasher`, header.rs:31)."""
    return hashlib.blake2b(data, digest_size=32).digest()
