"""Poseidon permutation / sponge / Merkle-cap tests."""

import hashlib

import numpy as np

from vectorx_tpu import merkle
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.fri.transcript import Challenger
from vectorx_tpu.hash import poseidon, poseidon_py

P = gl.P
RNG = np.random.default_rng(2)


def rand(n):
    return RNG.integers(0, P, size=n, dtype=np.uint64)


def test_permute_matches_scalar_oracle():
    states = rand(3 * 12).reshape(3, 12)
    lo, hi = gl.from_u64(states)
    out = gl.to_u64(*poseidon.permute(lo, hi))
    for i in range(3):
        exp = poseidon_py.permute([int(x) for x in states[i]])
        assert [int(x) for x in out[i]] == exp


def test_permutation_is_bijective_on_samples():
    a = rand(12).reshape(1, 12)
    b = a.copy()
    b[0, 0] = (b[0, 0] + 1) % P
    oa = gl.to_u64(*poseidon.permute(*gl.from_u64(a)))
    ob = gl.to_u64(*poseidon.permute(*gl.from_u64(b)))
    assert not np.array_equal(oa, ob)


def test_hash_no_pad_matches_scalar():
    for k in (1, 4, 8, 9, 20):
        data = rand(2 * k).reshape(2, k)
        out = gl.to_u64(*poseidon.hash_no_pad(*gl.from_u64(data)))
        for i in range(2):
            exp = poseidon_py.hash_no_pad([int(x) for x in data[i]])
            assert [int(x) for x in out[i]] == exp, f"k={k}"


def test_merkle_tree_roundtrip():
    n, leaf_len = 32, 6
    leaves = rand(n * leaf_len).reshape(n, leaf_len)
    for cap_height in (0, 2):
        tree = merkle.build_tree(*gl.from_u64(leaves), cap_height=cap_height)
        cap = tree.cap_ints()
        assert len(cap) == 1 << cap_height
        for idx in (0, 5, n - 1):
            path = tree.open(idx)
            leaf = [int(x) for x in leaves[idx]]
            assert merkle.verify_path(leaf, idx, path, cap, num_leaves=n)
            bad = list(leaf)
            bad[0] = (bad[0] + 1) % P
            assert not merkle.verify_path(bad, idx, path, cap, num_leaves=n)
            # malformed shapes must reject, not raise (ADVICE.md)
            assert not merkle.verify_path(leaf, idx, path[:-1], cap,
                                          num_leaves=n)
            assert not merkle.verify_path(leaf, idx, path + [path[0]], cap,
                                          num_leaves=n)
            assert not merkle.verify_path(leaf, idx + n, path, cap,
                                          num_leaves=n)


def test_short_leaf_noop_hash():
    n = 8
    leaves = rand(n * 3).reshape(n, 3)
    tree = merkle.build_tree(*gl.from_u64(leaves), cap_height=0)
    got = tree.layers[0]  # host uint64 (n, 4)
    assert np.array_equal(got[:, :3], leaves % np.uint64(P))
    assert np.all(got[:, 3] == 0)


def test_sha256_merkle_root_matches_reference_shape():
    # 3 leaves -> pad to 4 with zero leaves; nodes = sha256 pairs.
    leaves = [bytes([i]) * 32 for i in range(3)]
    pad = b"\x00" * 32
    n0 = hashlib.sha256(leaves[0] + leaves[1]).digest()
    n1 = hashlib.sha256(leaves[2] + pad).digest()
    exp = hashlib.sha256(n0 + n1).digest()
    assert merkle.sha256_merkle_root(leaves) == exp
    assert merkle.sha256_merkle_root([]) == b""


def test_challenger_deterministic_and_sensitive():
    c1, c2, c3 = Challenger(), Challenger(), Challenger()
    obs = [int(x) for x in rand(20)]
    c1.observe_many(obs)
    c2.observe_many(obs)
    c3.observe_many(obs[:-1] + [(obs[-1] + 1) % P])
    a, b, c = c1.get_n_challenges(4), c2.get_n_challenges(4), c3.get_n_challenges(4)
    assert a == b
    assert a != c
    assert all(0 <= x < P for x in a)


def test_challenger_bulk_absorb_matches_elementwise():
    # The device-scan bulk path (observe_many past BULK_MIN) must be
    # protocol-identical to element-wise observe(): same state, same
    # buffered tail, same output buffer, same downstream challenges.
    rng = np.random.default_rng(7)
    for extra in (0, 1, 5, 8, 11):
        n = Challenger.BULK_MIN + 64 + extra
        obs = [int(x) % P for x in rng.integers(0, 2**63, size=n, dtype=np.uint64)]
        bulk, elem = Challenger(), Challenger()
        elem.observe(3)          # start from a partial input buffer
        bulk.observe(3)
        for e in obs:
            elem.observe(e)
        bulk.observe_many(obs)
        assert bulk.state == elem.state
        assert bulk.input_buf == elem.input_buf
        assert bulk.output_buf == elem.output_buf
        assert bulk.get_n_challenges(6) == elem.get_n_challenges(6)


def test_from_u64_limb_split():
    from vectorx_tpu.field import goldilocks as gl

    rng = np.random.default_rng(11)
    arr = rng.integers(0, 2**64, size=(3, 17), dtype=np.uint64)
    lo, hi = gl.from_u64(arr)
    assert np.array_equal(np.asarray(lo), (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    assert np.array_equal(np.asarray(hi), (arr >> np.uint64(32)).astype(np.uint32))
    # non-contiguous input (transposed view) must still split correctly
    lo2, hi2 = gl.from_u64(arr.T)
    assert np.array_equal(np.asarray(lo2), np.asarray(lo).T)
