"""SHA-256 / Blake2b device kernels vs hashlib (RFC/NIST-backed) oracles."""

import hashlib

import numpy as np

from vectorx_tpu.hash.blake2b import blake2b_256, blake2b_batch
from vectorx_tpu.hash.sha256 import chained_hash, sha256_batch

RNG = np.random.default_rng(4)


def test_sha256_batch_vs_hashlib():
    for L in (0, 1, 32, 55, 56, 64, 100, 128):
        B = 4
        msgs = RNG.integers(0, 256, size=(B, L), dtype=np.uint8)
        out = sha256_batch(msgs)
        for i in range(B):
            exp = hashlib.sha256(msgs[i].tobytes()).digest()
            assert out[i].tobytes() == exp, f"L={L} row={i}"


def test_sha256_known_vector():
    # NIST: SHA256("abc")
    msgs = np.frombuffer(b"abc", dtype=np.uint8).reshape(1, 3)
    assert sha256_batch(msgs)[0].tobytes().hex() == \
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"


def test_chained_hash_matches_reference_shape():
    # SHA256(SHA256(SHA256(k0) || k1) || k2)  (justification.rs:127-162)
    keys = [bytes([i]) * 32 for i in range(3)]
    acc = hashlib.sha256(keys[0]).digest()
    acc = hashlib.sha256(acc + keys[1]).digest()
    acc = hashlib.sha256(acc + keys[2]).digest()
    assert chained_hash(keys) == acc


def test_blake2b_batch_vs_hashlib():
    max_len = 300
    lengths = np.array([0, 1, 127, 128, 129, 255, 256, 300], dtype=np.uint32)
    B = len(lengths)
    msgs = RNG.integers(0, 256, size=(B, max_len), dtype=np.uint8)
    for i, L in enumerate(lengths):
        msgs[i, L:] = 0
    out = blake2b_batch(msgs, lengths)
    for i, L in enumerate(lengths):
        exp = hashlib.blake2b(msgs[i, :L].tobytes(), digest_size=32).digest()
        assert out[i].tobytes() == exp, f"len={L}"


def test_blake2b_known_vector():
    # RFC 7693 appendix has blake2b-512("abc"); for 256 use hashlib oracle
    assert blake2b_256(b"abc") == hashlib.blake2b(b"abc", digest_size=32).digest()


def test_blake2b_header_scale():
    # Avail-header-sized input (~15KB within the 35,840-byte circuit bound)
    L = 15360
    msgs = RNG.integers(0, 256, size=(2, 35840), dtype=np.uint8)
    msgs[:, L:] = 0
    out = blake2b_batch(msgs, np.array([L, L], dtype=np.uint32))
    for i in range(2):
        exp = hashlib.blake2b(msgs[i, :L].tobytes(), digest_size=32).digest()
        assert out[i].tobytes() == exp


def test_blake2b_batch_masks_garbage_tails():
    """Digest must depend only on the first lengths[i] bytes — bytes past
    the length (caller buffer garbage) are masked inside, like hashlib."""
    rng = np.random.default_rng(5)
    lens = [0, 7, 128, 129, 1000]
    msgs = rng.integers(1, 256, size=(len(lens), 1024), dtype=np.uint8)
    out = blake2b_batch(msgs, np.array(lens, dtype=np.uint32))
    for i, ln in enumerate(lens):
        exp = hashlib.blake2b(bytes(msgs[i, :ln].tolist()),
                              digest_size=32).digest()
        assert bytes(out[i]) == exp
