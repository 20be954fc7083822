"""Poseidon permutation over Goldilocks — width 12, x^7 S-box, 8 full + 22
partial rounds — plus the sponge / two-to-one compression used for FRI Merkle
caps and the Fiat-Shamir transcript.

Role in the stack: this is the TPU-native equivalent of plonky2's
`PoseidonHash` (the FRI Merkle-cap and transcript hash of the reference
proving stack — SURVEY.md §2 E1; `DefaultParameters` used in every reference
test, /root/reference/circuits/header_range.rs:96).

Parameters: the round-constant schedule and MDS matrix are generated with the
official Poseidon reference procedure (Grain LFSR stream for round constants,
Cauchy matrix for the MDS) for (GF(p), x^7, t=12, R_F=8, R_P=22).  plonky2
ships its own hard-coded table which is not derivable offline; the sponge
*structure* (rate 8, capacity 4, overwrite-mode absorb, 4-element digests,
two-to-one compression layout) matches plonky2 exactly, and
`load_round_constants` lets a deployment drop in plonky2's table to get
bit-exact digests when that table is available.  All proofs in this repo are
self-consistently verifiable either way.

State layout: ``(lo, hi)`` uint32 arrays of shape (..., 12); the batch
dimensions vectorize over the VPU (hash many leaves / transcript lanes at
once).
"""

from __future__ import annotations

import functools
import json

import jax
import jax.numpy as jnp
import numpy as np

from vectorx_tpu.field import goldilocks as gl

P = gl.P

WIDTH = 12
RATE = 8
CAPACITY = 4
DIGEST = 4
FULL_ROUNDS = 8
PARTIAL_ROUNDS = 22
ALPHA = 7
N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS


# ---------------------------------------------------------------------------
# Parameter generation (Grain LFSR + Cauchy MDS), per the Poseidon reference.
# ---------------------------------------------------------------------------

def _grain_bits(n_bits: int, t: int, r_f: int, r_p: int):
    """The Grain LFSR bit stream from the official generate_params procedure."""
    state = []
    for value, width in ((1, 2), (0, 4), (n_bits, 12), (t, 12), (r_f, 10), (r_p, 10)):
        state.extend(int(b) for b in bin(value)[2:].zfill(width))
    state.extend([1] * 30)
    assert len(state) == 80

    def update():
        new = state[62] ^ state[51] ^ state[38] ^ state[23] ^ state[13] ^ state[0]
        state.pop(0)
        state.append(new)
        return new

    for _ in range(160):
        update()

    def next_bit():
        # evaluate bits in pairs: emit the second iff the first is 1
        while True:
            if update() == 1:
                return update()
            update()

    while True:
        yield next_bit()


@functools.lru_cache(maxsize=None)
def _generated_round_constants() -> tuple:
    gen = _grain_bits(64, WIDTH, FULL_ROUNDS, PARTIAL_ROUNDS)
    consts = []
    while len(consts) < WIDTH * N_ROUNDS:
        v = 0
        for _ in range(64):
            v = (v << 1) | next(gen)
        if v < P:
            consts.append(v)
    return tuple(consts)


@functools.lru_cache(maxsize=None)
def _generated_mds() -> tuple:
    """Cauchy MDS: M[i][j] = 1 / (x_i + y_j), x_i = i, y_j = t + j."""
    rows = []
    for i in range(WIDTH):
        row = []
        for j in range(WIDTH):
            row.append(pow((i + (WIDTH + j)) % P, P - 2, P))
        rows.append(tuple(row))
    return tuple(rows)


_OVERRIDE = {"rc": None, "mds": None}
_PARAMS_EPOCH = 0


def params_epoch() -> int:
    """Monotone counter bumped whenever the parameter table changes —
    cached jitted graphs bake the table in as constants, so any cache
    keyed on graph structure must include this (stark/stages.py)."""
    return _PARAMS_EPOCH


def load_round_constants(path: str) -> None:
    """Load an external parameter table (e.g. plonky2's) from JSON:
    {"round_constants": [360 ints], "mds": [[12x12 ints]]}.
    """
    with open(path) as f:
        data = json.load(f)
    rc = tuple(int(x) % P for x in data["round_constants"])
    assert len(rc) == WIDTH * N_ROUNDS
    mds = tuple(tuple(int(x) % P for x in row) for row in data["mds"])
    assert len(mds) == WIDTH and all(len(r) == WIDTH for r in mds)
    global _PARAMS_EPOCH
    _OVERRIDE["rc"] = rc
    _OVERRIDE["mds"] = mds
    _PARAMS_EPOCH += 1
    _params.cache_clear()
    _fast_partial_params.cache_clear()
    # jitted callables bake the parameter tables in as constants
    permute.clear_cache()
    hash_no_pad.clear_cache()
    two_to_one.clear_cache()


def _mat_inv_mod_p(m: list[list[int]]) -> list[list[int]]:
    """Inverse of a small matrix over GF(p) by Gauss-Jordan (exact ints)."""
    t = len(m)
    a = [row[:] + [1 if i == j else 0 for j in range(t)]
         for i, row in enumerate(m)]
    for col in range(t):
        piv = next(r for r in range(col, t) if a[r][col] % P != 0)
        a[col], a[piv] = a[piv], a[col]
        inv = pow(a[col][col], P - 2, P)
        a[col] = [(x * inv) % P for x in a[col]]
        for r in range(t):
            if r != col and a[r][col]:
                f = a[r][col]
                a[r] = [(x - f * y) % P for x, y in zip(a[r], a[col])]
    return [row[t:] for row in a]


def _mat_vec(m, v):
    return [sum(mi * vi for mi, vi in zip(row, v)) % P for row in m]


def _mat_mul(a, b):
    t = len(a)
    return [[sum(a[i][k] * b[k][j] for k in range(t)) % P for j in range(t)]
            for i in range(t)]


@functools.lru_cache(maxsize=None)
def _fast_partial_params():
    """Sparse decomposition of the partial-round chain (Poseidon paper
    App. B; plonky2's `poseidon::partial_rounds` fast path).

    Each partial round's dense MDS matvec (144 muls) is replaced by a
    sparse matrix ρ_i (first row arbitrary, first column arbitrary,
    identity elsewhere: 23 muls), with ONE leftover dense matrix σ_last
    applied after the chain and the round constants transformed to match.
    Bit-exact with the naive chain: round i's map is M·sbox0·(+c_i);
    decomposing N_i = σ_i·ρ_i (N_0 = M, N_{i+1} = M·σ_i) and commuting
    σ through sbox0 (it fixes lane 0) gives
        chain = σ_last · Π_i [ρ_i · sbox0 · (+c_i')],  c_i' = σ_{i-1}^{-1}c_i.
    """
    rc = _OVERRIDE["rc"] or _generated_round_constants()
    mds = _OVERRIDE["mds"] or _generated_mds()
    m = [list(row) for row in mds]
    half = FULL_ROUNDS // 2
    cs = [list(rc[(half + i) * WIDTH:(half + i + 1) * WIDTH])
          for i in range(PARTIAL_ROUNDS)]

    rho_v, rho_w, c_prime = [], [], []
    n = m
    prev_inv_hat = None
    for i in range(PARTIAL_ROUNDS):
        n_hat = [row[1:] for row in n[1:]]
        omega = [row[0] for row in n[1:]]
        nu = n[0][1:]
        n_hat_inv = _mat_inv_mod_p(n_hat)
        w_hat = _mat_vec(n_hat_inv, omega)
        rho_v.append([n[0][0]] + nu)            # first row of ρ_i
        rho_w.append(w_hat)                     # first column (below) of ρ_i
        if i == 0:
            c_prime.append(cs[0])
        else:
            c_prime.append([cs[i][0]] + _mat_vec(prev_inv_hat, cs[i][1:]))
        prev_inv_hat = n_hat_inv
        # σ_i = blockdiag(1, N̂_i);  N_{i+1} = M · σ_i
        sigma = [[1 if (r == 0 and c == 0) else 0 for c in range(WIDTH)]
                 for r in range(WIDTH)]
        for r in range(1, WIDTH):
            for c in range(1, WIDTH):
                sigma[r][c] = n_hat[r - 1][c - 1]
        n = _mat_mul(m, sigma)
        sigma_last = sigma                      # σ of the LAST decomposition

    def split(a):
        a = np.array(a, dtype=np.uint64)
        return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (a >> np.uint64(32)).astype(np.uint32))

    return (split(rho_v), split(rho_w), split(c_prime), split(sigma_last))


@functools.lru_cache(maxsize=None)
def _params():
    rc = _OVERRIDE["rc"] or _generated_round_constants()
    mds = _OVERRIDE["mds"] or _generated_mds()
    rc_arr = np.array(rc, dtype=np.uint64).reshape(N_ROUNDS, WIDTH)
    mds_arr = np.array(mds, dtype=np.uint64)
    def split(a):
        # numpy (not device) arrays: safe to cache across jit traces
        return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (a >> np.uint64(32)).astype(np.uint32))
    return split(rc_arr), split(mds_arr)


# ---------------------------------------------------------------------------
# Permutation
# ---------------------------------------------------------------------------

def _sbox(lo, hi):
    """x^7 = x^4 * x^2 * x  (3 squarings-equivalent, 4 muls)."""
    s2l, s2h = gl.sqr(lo, hi)
    s4l, s4h = gl.sqr(s2l, s2h)
    s6l, s6h = gl.mul(s2l, s2h, s4l, s4h)
    return gl.mul(s6l, s6h, lo, hi)


def _mds_layer(lo, hi, mds):
    """Dense 12x12 field matvec: out_i = sum_j M[i][j] * s_j."""
    (ml, mh) = mds
    # lo/hi: (..., 12) -> products (..., 12(out), 12(in))
    pl, ph = gl.mul(lo[..., None, :], hi[..., None, :], ml, mh)
    # tree-reduce sum along the last axis
    while pl.shape[-1] > 1:
        half = pl.shape[-1] // 2
        al, ah = pl[..., :half], ph[..., :half]
        bl, bh = pl[..., half:half * 2], ph[..., half:half * 2]
        sl, sh = gl.add(al, ah, bl, bh)
        if pl.shape[-1] % 2:
            sl = jnp.concatenate([sl, pl[..., -1:]], axis=-1)
            sh = jnp.concatenate([sh, ph[..., -1:]], axis=-1)
        pl, ph = sl, sh
    return pl[..., 0], ph[..., 0]


@functools.partial(jax.jit)
def permute(lo, hi):
    """Poseidon permutation on state (..., 12).

    Each phase's rounds run under lax.scan with the round constants as scan
    inputs — unrolling all 30 rounds (30 × 144 field muls) makes XLA:CPU
    compile times blow up super-linearly.
    """
    (rcl, rch), mds = _params()
    half = FULL_ROUNDS // 2

    def full_round(state, rc):
        lo, hi = state
        lo, hi = gl.add(lo, hi, rc[0], rc[1])
        lo, hi = _sbox(lo, hi)
        lo, hi = _mds_layer(lo, hi, mds)
        return (lo, hi), None

    (vl, vh), (wl, wh), (cl_, ch_), (sgl, sgh) = _fast_partial_params()

    def partial_round(state, per):
        """Sparse partial round: +c', sbox on lane 0, ρ matvec (23 muls —
        the dense-MDS residue is the single σ_last matvec after the scan)."""
        lo, hi = state
        pvl, pvh, pwl, pwh, pcl, pch = per
        lo, hi = gl.add(lo, hi, pcl, pch)
        s0l, s0h = _sbox(lo[..., :1], hi[..., :1])
        lo = jnp.concatenate([s0l, lo[..., 1:]], axis=-1)
        hi = jnp.concatenate([s0h, hi[..., 1:]], axis=-1)
        # out0 = ρ_row0 · s (tree-summed); out_{1:} = s_{1:} + ŵ·s0
        pl, ph = gl.mul(lo, hi, pvl, pvh)
        while pl.shape[-1] > 1:
            h2 = pl.shape[-1] // 2
            sl_, sh_ = gl.add(pl[..., :h2], ph[..., :h2],
                              pl[..., h2:2 * h2], ph[..., h2:2 * h2])
            if pl.shape[-1] % 2:
                sl_ = jnp.concatenate([sl_, pl[..., -1:]], axis=-1)
                sh_ = jnp.concatenate([sh_, ph[..., -1:]], axis=-1)
            pl, ph = sl_, sh_
        tl, th = gl.mul(s0l, s0h, pwl, pwh)
        rl, rh = gl.add(lo[..., 1:], hi[..., 1:], tl, th)
        return (jnp.concatenate([pl, rl], axis=-1),
                jnp.concatenate([ph, rh], axis=-1)), None

    rcl = jnp.asarray(rcl)
    rch = jnp.asarray(rch)
    st = (lo, hi)
    st, _ = jax.lax.scan(full_round, st, (rcl[:half], rch[:half]))
    st, _ = jax.lax.scan(partial_round, st,
                         (jnp.asarray(vl), jnp.asarray(vh),
                          jnp.asarray(wl), jnp.asarray(wh),
                          jnp.asarray(cl_), jnp.asarray(ch_)))
    st = _mds_layer(st[0], st[1], (jnp.asarray(sgl), jnp.asarray(sgh)))
    st, _ = jax.lax.scan(full_round, st, (rcl[half + PARTIAL_ROUNDS:],
                                          rch[half + PARTIAL_ROUNDS:]))
    return st


# ---------------------------------------------------------------------------
# Sponge / digests (plonky2 layout: rate 8, capacity 4, 4-element digest)
# ---------------------------------------------------------------------------

@jax.jit
def hash_no_pad(lo, hi):
    """Hash (..., k) field elements to a (..., 4) digest.

    Overwrite-mode sponge: absorb 8 lanes per permutation (no padding),
    squeeze the first 4 lanes — the layout of plonky2's `hash_n_to_m_no_pad`.

    Full-rate chunks absorb under lax.scan (unrolling hundreds of chunked
    permutations for wide leaves blows up XLA:CPU compile times); a short
    final chunk is absorbed separately, preserving exact semantics.
    """
    batch = lo.shape[:-1]
    k = lo.shape[-1]
    sl = jnp.zeros((*batch, WIDTH), jnp.uint32)
    sh = jnp.zeros((*batch, WIDTH), jnp.uint32)
    full = k // RATE
    if full:
        xl = jnp.moveaxis(
            lo[..., :full * RATE].reshape(*batch, full, RATE), -2, 0)
        xh = jnp.moveaxis(
            hi[..., :full * RATE].reshape(*batch, full, RATE), -2, 0)

        def step(st, chunk):
            cl, ch = chunk
            s0 = jnp.concatenate([cl, st[0][..., RATE:]], axis=-1)
            s1 = jnp.concatenate([ch, st[1][..., RATE:]], axis=-1)
            return permute(s0, s1), None

        (sl, sh), _ = jax.lax.scan(step, (sl, sh), (xl, xh))
    rem = k - full * RATE
    if rem:
        sl = jnp.concatenate([lo[..., full * RATE:], sl[..., rem:]], axis=-1)
        sh = jnp.concatenate([hi[..., full * RATE:], sh[..., rem:]], axis=-1)
        sl, sh = permute(sl, sh)
    return sl[..., :DIGEST], sh[..., :DIGEST]


@jax.jit
def absorb_blocks(sl, sh, xl, xh, m):
    """Thread a single sponge state through a sequence of full-rate absorbs.

    ``sl``/``sh``: (12,) uint32 limb state.  ``xl``/``xh``: (M, RATE) blocks,
    of which only the first ``m`` (dynamic, so one compile serves all
    pow2-padded transcript sizes) are absorbed; the rest are masked no-ops.
    Each active block overwrites the rate lanes and permutes — exactly the
    host Challenger's ``_duplex`` — but as ONE device dispatch instead of a
    host Python permutation per 8 observed elements (the round-3 transcript
    cost for multi-KB public inputs, VERDICT.md weak #1).
    """
    idx = jnp.arange(xl.shape[0], dtype=jnp.uint32)

    def step(st, inp):
        i, cl, ch = inp
        s0 = jnp.concatenate([cl, st[0][RATE:]], axis=-1)
        s1 = jnp.concatenate([ch, st[1][RATE:]], axis=-1)
        nl, nh = permute(s0, s1)
        keep = i < m
        return (jnp.where(keep, nl, st[0]), jnp.where(keep, nh, st[1])), None

    (sl, sh), _ = jax.lax.scan(step, (sl, sh), (idx, xl, xh))
    return sl, sh


@jax.jit
def two_to_one(left, right):
    """Compress two (..., 4) digests into one — the Merkle interior node op."""
    (ll, lh), (rl, rh) = left, right
    batch = ll.shape[:-1]
    zl = jnp.zeros((*batch, WIDTH - 2 * DIGEST), jnp.uint32)
    sl = jnp.concatenate([ll, rl, zl], axis=-1)
    sh = jnp.concatenate([lh, rh, zl], axis=-1)
    sl, sh = permute(sl, sh)
    return sl[..., :DIGEST], sh[..., :DIGEST]
