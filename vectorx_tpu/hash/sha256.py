"""SHA-256 — batched device kernel + host reference.

Role: the reference stack commits data/state roots with byte-level SHA-256
Merkle trees and chains SHA-256 over authority pubkeys
(/root/reference/circuits/builder/justification.rs:127-162, curta_sha256 at
justification.rs:140,156; /root/reference/circuits/input/mod.rs:464-489).

The device kernel vectorizes the 64-round compression over a batch axis
(uint32 words on the VPU) — used for the batched Merkle layers and for
generating SHA-256 AIR traces.  Host paths use hashlib (C speed) — e.g. the
sequential chained authority-set commitment.
"""

from __future__ import annotations

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

_K = np.array([
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2], dtype=np.uint32)

_H0 = np.array([0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
                0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19],
               dtype=np.uint32)


def _rotr(x, r):
    return (x >> r) | (x << (32 - r))


@jax.jit
def compress_blocks(state, words):
    """One SHA-256 compression per batch row.

    state: (B, 8) uint32; words: (B, 16) uint32 (one 64-byte block per row).
    Returns the updated (B, 8) state.

    Rounds run under lax.fori_loop: fully unrolling 64 rounds triggers
    super-linear XLA:CPU compile times (measured ~4x per 8 extra rounds),
    while a rolled loop compiles in <1s and vectorizes over B identically.
    """
    B = words.shape[0]

    # message schedule: w[t] for t in [0, 64), built by a 48-step scan
    def sched_step(carry, _):
        # carry: (B, 16) ring buffer of the last 16 w values
        w = carry
        s0 = _rotr(w[:, 1], 7) ^ _rotr(w[:, 1], 18) ^ (w[:, 1] >> 3)
        s1 = _rotr(w[:, 14], 17) ^ _rotr(w[:, 14], 19) ^ (w[:, 14] >> 10)
        nw = w[:, 0] + s0 + w[:, 9] + s1
        w = jnp.concatenate([w[:, 1:], nw[:, None]], axis=1)
        return w, nw

    _, extra = jax.lax.scan(sched_step, words, None, length=48)
    # full schedule (64, B)
    w_all = jnp.concatenate([jnp.transpose(words, (1, 0)), extra], axis=0)

    k_all = jnp.asarray(_K)

    def round_step(st, inp):
        wt, kt = inp
        a, b, c, d, e, f, g, h = [st[:, i] for i in range(8)]
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + kt + wt
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        t2 = S0 + maj
        return jnp.stack([t1 + t2, a, b, c, d + t1, e, f, g], axis=1), None

    final, _ = jax.lax.scan(round_step, state, (w_all, k_all))
    return state + final


def _pad_to_blocks(msgs: np.ndarray, msg_len: int) -> np.ndarray:
    """(B, msg_len) bytes -> (B, nblocks, 16) big-endian words with SHA
    padding (all rows share msg_len)."""
    B = msgs.shape[0]
    total = msg_len + 1 + 8
    nblocks = (total + 63) // 64
    buf = np.zeros((B, nblocks * 64), dtype=np.uint8)
    buf[:, :msg_len] = msgs
    buf[:, msg_len] = 0x80
    bitlen = np.uint64(msg_len * 8)
    buf[:, -8:] = np.frombuffer(bitlen.tobytes(), dtype=np.uint8)[::-1]
    words = buf.reshape(B, nblocks, 16, 4)
    w = (words[..., 0].astype(np.uint32) << 24) | \
        (words[..., 1].astype(np.uint32) << 16) | \
        (words[..., 2].astype(np.uint32) << 8) | \
        words[..., 3].astype(np.uint32)
    return w


def sha256_batch(msgs: np.ndarray) -> np.ndarray:
    """SHA-256 of a batch of equal-length messages.

    msgs: (B, L) uint8.  Returns (B, 32) uint8 digests.  The compression
    loop runs on device, vectorized over B.
    """
    B, L = msgs.shape
    words = _pad_to_blocks(msgs, L)
    state = jnp.broadcast_to(jnp.asarray(_H0), (B, 8)).astype(jnp.uint32)
    for blk in range(words.shape[1]):
        state = compress_blocks(state, jnp.asarray(words[:, blk]))
    st = np.asarray(jax.device_get(state), dtype=np.uint32)
    out = np.zeros((B, 32), dtype=np.uint8)
    for i in range(8):
        out[:, 4 * i] = (st[:, i] >> 24) & 0xFF
        out[:, 4 * i + 1] = (st[:, i] >> 16) & 0xFF
        out[:, 4 * i + 2] = (st[:, i] >> 8) & 0xFF
        out[:, 4 * i + 3] = st[:, i] & 0xFF
    return out


def sha256(data: bytes) -> bytes:
    """Host single-shot (hashlib)."""
    return hashlib.sha256(data).digest()


def chained_hash(items: list[bytes]) -> bytes:
    """Chained SHA-256: H(..H(H(x0) || x1) || x2 ..) — the authority-set
    commitment shape (justification.rs:127-162, input/mod.rs:250-260)."""
    acc = b""
    for item in items:
        acc = hashlib.sha256(acc + item).digest()
    return acc
