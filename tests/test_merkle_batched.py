"""Batched Merkle path verification (merkle.verify_paths*) — unit tests.

The host verifier routes all query openings through these; they must
match scalar `verify_path` acceptance exactly (modulo stricter rejection
of non-uint64 encodings) across tamper, ragged, and cap-slot cases.
"""

import numpy as np

from vectorx_tpu import merkle
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.hash import poseidon_np, poseidon_py


RNG = np.random.default_rng(77)


def _tree(n_leaves, cap_height=1, leaf_len=6):
    leaves = [[int(x) for x in RNG.integers(0, gl.P, size=leaf_len,
                                            dtype=np.uint64)]
              for _ in range(n_leaves)]
    # build digests bottom-up with the scalar oracle
    digs = [poseidon_py.hash_no_pad(lf) if leaf_len > 4
            else (list(lf) + [0] * (4 - leaf_len)) for lf in leaves]
    layers = [digs]
    while len(layers[-1]) > (1 << cap_height):
        prev = layers[-1]
        layers.append([poseidon_py.two_to_one(prev[2 * i], prev[2 * i + 1])
                       for i in range(len(prev) // 2)])
    cap = layers[-1]

    def path(ix):
        out = []
        i = ix
        for lvl in layers[:-1]:
            out.append(list(lvl[i ^ 1]))
            i >>= 1
        return out

    return leaves, cap, path


def test_matches_scalar_and_rejects_tampers():
    n = 32
    leaves, cap, path = _tree(n)
    idx = [0, 5, 13, 31, 5]
    paths = [path(i) for i in idx]
    lvs = [leaves[i] for i in idx]
    assert merkle.verify_paths(lvs, idx, paths, cap, num_leaves=n)
    # scalar agreement
    for lf, i, p in zip(lvs, idx, paths):
        assert merkle.verify_path(lf, i, p, cap, num_leaves=n)
    # tampered leaf
    bad = [list(l) for l in lvs]
    bad[2][0] ^= 1
    assert not merkle.verify_paths(bad, idx, paths, cap, num_leaves=n)
    # tampered sibling
    bp = [[list(s) for s in p] for p in paths]
    bp[1][2][3] ^= 1
    assert not merkle.verify_paths(lvs, idx, bp, cap, num_leaves=n)
    # tampered cap
    bc = [list(c) for c in cap]
    bc[0][0] ^= 1
    assert not merkle.verify_paths(lvs, idx, paths, bc, num_leaves=n)
    # wrong index
    assert not merkle.verify_paths(lvs, [1, 5, 13, 31, 5], paths, cap,
                                   num_leaves=n)


def test_ragged_falls_back_to_scalar():
    n = 16
    leaves, cap, path = _tree(n, leaf_len=3)
    idx = [2, 7]
    paths = [path(i) for i in idx]
    lvs = [leaves[2], leaves[7] + [0]]          # ragged leaf lengths
    # scalar fallback verdict: second leaf padded with explicit zero is
    # the same digest (len <= DIGEST pads with zeros) -> still true
    assert merkle.verify_paths(lvs, idx, paths, cap, num_leaves=n) == all(
        merkle.verify_path(lf, i, p, cap, num_leaves=n)
        for lf, i, p in zip(lvs, idx, paths))


def test_structural_rejections():
    n = 16
    leaves, cap, path = _tree(n)
    idx = [3]
    paths = [path(3)]
    lvs = [leaves[3]]
    assert not merkle.verify_paths(lvs, idx, paths, cap, num_leaves=12)
    assert not merkle.verify_paths(lvs, [16], paths, cap, num_leaves=n)
    assert not merkle.verify_paths(lvs, idx, [paths[0][:-1]], cap,
                                   num_leaves=n)
    # non-uint64 values are rejected, never crash
    assert not merkle.verify_paths([[1 << 70] * 6], idx, paths, cap,
                                   num_leaves=n)


def test_multi_fuses_same_height_trees():
    n = 32
    g1 = _tree(n, leaf_len=6)
    g2 = _tree(n, leaf_len=3)
    idx = [4, 9, 30]
    groups = []
    for leaves, cap, path in (g1, g2):
        groups.append(([leaves[i] for i in idx],
                       [path(i) for i in idx], cap))
    assert merkle.verify_paths_multi(groups, idx, num_leaves=n)
    bad = ([g1[0][i] for i in idx], [g1[2](i) for i in idx],
           [list(c) for c in g1[1]])
    bad[2][1][2] ^= 1
    assert not merkle.verify_paths_multi([groups[0], bad], idx,
                                         num_leaves=n)


def test_jagged_fuses_different_heights():
    ga = _tree(64, leaf_len=4)
    gb = _tree(8, leaf_len=4)
    ia, ib = [0, 17, 63], [1, 6, 6]
    groups = [
        ([ga[0][i] for i in ia], ia, [ga[2](i) for i in ia], ga[1], 64),
        ([gb[0][i] for i in ib], ib, [gb[2](i) for i in ib], gb[1], 8),
    ]
    assert merkle.verify_paths_jagged(groups)
    bad_paths = [[list(s) for s in gb[2](i)] for i in ib]
    bad_paths[0][0][0] ^= 1
    assert not merkle.verify_paths_jagged([
        groups[0],
        ([gb[0][i] for i in ib], ib, bad_paths, gb[1], 8)])


def test_numpy_poseidon_is_bit_exact_oracle():
    states = RNG.integers(0, gl.P, size=(9, 12), dtype=np.uint64)
    out = poseidon_np.permute(states)
    fast = poseidon_np.permute_fast(states)
    for k in range(9):
        exp = poseidon_py.permute([int(x) for x in states[k]])
        assert [int(x) for x in out[k]] == exp
        assert [int(x) for x in fast[k]] == exp
