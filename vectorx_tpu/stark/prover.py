"""STARK prover: trace commit → constraint composition → quotient →
DEEP opening → FRI, all heavy stages batched on device.

This is the TPU-native replacement for the reference stack's per-proof CPU
pipeline (plonky2 witness-gen → LDE → Merkle → FRI, SURVEY.md §3.1 "HOTTEST"
block).  One proof = a handful of big fixed-shape device computations:

  trace LDE        : batched NTT over (width, 8n)
  trace commit     : one batched Poseidon Merkle build
  composition      : vectorized constraint eval over all 8n points
  quotient         : pointwise division + iNTT + chunk re-NTT
  DEEP composition : batched extension arithmetic over the domain
  FRI              : log-many fold+commit stages

The Fiat-Shamir transcript (tiny, sequential) stays on host and is identical
for the verifier — and across hosts in a multi-host proof.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from vectorx_tpu import merkle
from vectorx_tpu.field import ext_py
from vectorx_tpu.field import extension as ge
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.fri.fri import (FriConfig, derive_query_indices, fri_prove,
                                 open_query)
from vectorx_tpu.fri.transcript import Challenger
from vectorx_tpu.ntt import coset_intt, coset_ntt, intt, lde, power_table
from vectorx_tpu.ntt.ntt import _root_of_unity
from vectorx_tpu.stark.air import Air, DeviceAlgebra

P = gl.P


@dataclass(frozen=True)
class StarkConfig:
    fri: FriConfig = field(default_factory=FriConfig)

    @property
    def rate_bits(self):
        return self.fri.rate_bits


@dataclass
class TreeOpening:
    leaf: list  # ints
    path: list


@dataclass
class StarkProof:
    trace_cap: list
    quotient_cap: list
    trace_at_zeta: list          # W ext pairs
    trace_at_zeta_next: list     # W ext pairs
    quotient_at_zeta: list       # chunks ext pairs
    fri_proof: object
    trace_openings: list         # per query: TreeOpening
    quotient_openings: list      # per query: TreeOpening
    constants_at_zeta: list = field(default_factory=list)  # K ext pairs
    constants_openings: list = field(default_factory=list)


def preprocess(air: Air, config: "StarkConfig"):
    """Build the preprocessed-columns commitment (the AIR's "verification
    key").  Deterministic; prover and verifier both derive it.  Returns
    (tree or None, lde (lo, hi) or None, coeff (lo, hi) or None)."""
    consts = air.constant_columns()
    if consts.shape[0] == 0:
        return None, None, None
    n = air.n
    N = n << config.rate_bits
    cl, ch = gl.from_u64(consts)
    kl, kh = intt(cl, ch)
    pad = ((0, 0), (0, N - n))
    ll, lh = coset_ntt(jnp.pad(kl, pad), jnp.pad(kh, pad))
    tree = merkle.build_tree(ll.T, lh.T, cap_height=config.fri.cap_height)
    return tree, (ll, lh), (kl, kh)


def _num_quotient_chunks(air: Air) -> int:
    return max(air.constraint_degree, 2) - 1


def _ext_from_pair(pair):
    """Python (c0, c1) -> broadcastable device ext scalar."""
    return ge.from_pair_u64(np.uint64(pair[0]), np.uint64(pair[1]))


def _ext_scale_base(pair_dev, bl, bh):
    """ext scalar * base array -> ext array."""
    a0l, a0h, a1l, a1h = pair_dev
    c0 = gl.mul(bl, bh, a0l, a0h)
    c1 = gl.mul(bl, bh, a1l, a1h)
    return (*c0, *c1)


def ext_power_table_host(zeta, count):
    """[ζ^0 .. ζ^(count-1)] as two numpy uint64 arrays (c0s, c1s)."""
    c0s = np.empty(count, dtype=np.uint64)
    c1s = np.empty(count, dtype=np.uint64)
    cur = ext_py.ONE
    for i in range(count):
        c0s[i], c1s[i] = cur
        cur = ext_py.mul(cur, zeta)
    return c0s, c1s


def eval_base_polys_at_ext(coeff_lo, coeff_hi, zeta):
    """Evaluate base-field polynomials (W, n) at an extension point ζ.
    Returns W (c0, c1) int pairs.  Device dot against a ζ-power table."""
    n = coeff_lo.shape[-1]
    z0, z1 = ext_power_table_host(zeta, n)
    z0l, z0h = gl.from_u64(z0)
    z1l, z1h = gl.from_u64(z1)

    def dot(tl, th):
        pl, ph = gl.mul(coeff_lo, coeff_hi, tl, th)
        while pl.shape[-1] > 1:
            half = pl.shape[-1] // 2
            sl, sh = gl.add(pl[..., :half], ph[..., :half],
                            pl[..., half:2 * half], ph[..., half:2 * half])
            if pl.shape[-1] % 2:
                sl = jnp.concatenate([sl, pl[..., -1:]], axis=-1)
                sh = jnp.concatenate([sh, ph[..., -1:]], axis=-1)
            pl, ph = sl, sh
        return gl.to_u64(pl[..., 0], ph[..., 0])

    e0 = dot(z0l, z0h)
    e1 = dot(z1l, z1h)
    e0 = np.atleast_1d(e0)
    e1 = np.atleast_1d(e1)
    return [(int(a), int(b)) for a, b in zip(e0, e1)]


def _domain_x(log_len: int, shift: int):
    """x_i = shift·w^i over the LDE domain, as (lo, hi) arrays."""
    n = 1 << log_len
    w = _root_of_unity(log_len, inverse=False)
    tl, th = power_table(w, n)
    sl = jnp.uint32(shift & 0xFFFFFFFF)
    sh = jnp.uint32(shift >> 32)
    return gl.mul(jnp.asarray(tl), jnp.asarray(th), sl, sh)


def _zh_on_domain(air: Air, config: StarkConfig):
    """Z_H(x) = x^n - 1 on the LDE coset: period-`blowup` values, tiled.
    Returns (zh_lo, zh_hi, zh_inv_lo, zh_inv_hi) arrays of length N."""
    n = air.n
    blowup = 1 << config.rate_bits
    N = n * blowup
    w8 = _root_of_unity(air.log_n + config.rate_bits, inverse=False)
    z8 = pow(w8, n, P)  # order `blowup`
    g_n = pow(gl.GENERATOR, n, P)
    vals = [(g_n * pow(z8, i, P) - 1) % P for i in range(blowup)]
    invs = [pow(v, P - 2, P) for v in vals]
    tile = N // blowup
    zh = np.tile(np.array(vals, dtype=np.uint64), tile)[:N]
    zhi = np.tile(np.array(invs, dtype=np.uint64), tile)[:N]
    # note: np.tile repeats the 8-long pattern; domain order has period 8 ✓
    return (*gl.from_u64(zh), *gl.from_u64(zhi))


def prove(air: Air, trace_u64: np.ndarray, config: StarkConfig = StarkConfig()
          ) -> StarkProof:
    n = air.n
    W = air.width
    assert trace_u64.shape == (W, n)
    blowup = 1 << config.rate_bits
    N = n * blowup
    log_N = air.log_n + config.rate_bits
    cap_h = config.fri.cap_height
    challenger = Challenger()
    public = air.public_inputs()
    challenger.observe_many(public)

    # ---- preprocessed (constant) columns ---------------------------------
    const_tree, const_lde, const_coeff = preprocess(air, config)
    if const_tree is not None:
        challenger.observe_cap(const_tree.cap_ints())
    K = air.constant_columns().shape[0]

    # ---- trace commit -----------------------------------------------------
    tl, th = gl.from_u64(trace_u64)                  # (W, n)
    coeff_l, coeff_h = intt(tl, th)                  # keep coefficients
    pad = ((0, 0), (0, N - n))
    tr_lde_l, tr_lde_h = coset_ntt(jnp.pad(coeff_l, pad),
                                   jnp.pad(coeff_h, pad))   # (W, N)
    trace_tree = merkle.build_tree(tr_lde_l.T, tr_lde_h.T, cap_height=cap_h)
    challenger.observe_cap(trace_tree.cap_ints())

    # ---- constraint composition ------------------------------------------
    alpha = challenger.get_extension_challenge()
    local = [(tr_lde_l[j], tr_lde_h[j]) for j in range(W)]
    nxt = [(jnp.roll(tr_lde_l[j], -blowup), jnp.roll(tr_lde_h[j], -blowup))
           for j in range(W)]
    consts_dev = None
    if K:
        cll, clh = const_lde
        consts_dev = [(cll[k], clh[k]) for k in range(K)]
    transition_vals = air.transition(DeviceAlgebra, local, nxt, public,
                                     consts_dev)

    xl, xh = _domain_x(log_N, gl.GENERATOR)
    zh_l, zh_h, zhinv_l, zhinv_h = _zh_on_domain(air, config)
    w = _root_of_unity(air.log_n, inverse=False)
    x_last = pow(w, n - 1, P)
    # (x - x_last) masks the last row out of the transition constraints
    xml, xmh = gl.sub(xl, xh, jnp.uint32(x_last & 0xFFFFFFFF),
                      jnp.uint32(x_last >> 32))

    acc = ge.zeros(xl.shape)
    a_pow = ext_py.ONE
    for t in transition_vals:
        cl, ch = gl.mul(t[0], t[1], xml, xmh)
        acc = ge.add(acc, _ext_scale_base(_ext_from_pair(a_pow), cl, ch))
        a_pow = ext_py.mul(a_pow, alpha)
    for (row, col, value) in air.boundaries(public):
        # (P_col(x) - v) · Z_H(x) / (x - w^row)
        x_r = pow(w, row, P)
        dl, dh = gl.sub(xl, xh, jnp.uint32(x_r & 0xFFFFFFFF),
                        jnp.uint32(x_r >> 32))
        dinv_l, dinv_h = gl.inv(dl, dh)
        pl, ph = gl.sub(tr_lde_l[col], tr_lde_h[col],
                        jnp.uint32(value & 0xFFFFFFFF),
                        jnp.uint32(value >> 32))
        cl, ch = gl.mul(pl, ph, zh_l, zh_h)
        cl, ch = gl.mul(cl, ch, dinv_l, dinv_h)
        acc = ge.add(acc, _ext_scale_base(_ext_from_pair(a_pow), cl, ch))
        a_pow = ext_py.mul(a_pow, alpha)

    # ---- quotient ---------------------------------------------------------
    q0 = gl.mul(acc[0], acc[1], zhinv_l, zhinv_h)
    q1 = gl.mul(acc[2], acc[3], zhinv_l, zhinv_h)
    qc0 = coset_intt(*q0)
    qc1 = coset_intt(*q1)
    chunks = _num_quotient_chunks(air)
    c0_host = gl.to_u64(*qc0)
    c1_host = gl.to_u64(*qc1)
    assert np.all(c0_host[chunks * n:] == 0) and np.all(c1_host[chunks * n:] == 0), \
        "composition polynomial exceeds quotient degree bound (AIR misconfigured?)"
    # chunk coefficient arrays (chunks*2, n): [Q0.c0, Q0.c1, Q1.c0, ...]
    qcoef = np.zeros((2 * chunks, n), dtype=np.uint64)
    for k in range(chunks):
        qcoef[2 * k] = c0_host[k * n:(k + 1) * n]
        qcoef[2 * k + 1] = c1_host[k * n:(k + 1) * n]
    ql, qh = gl.from_u64(qcoef)
    q_lde_l, q_lde_h = coset_ntt(jnp.pad(ql, ((0, 0), (0, N - n))),
                                 jnp.pad(qh, ((0, 0), (0, N - n))))
    quot_tree = merkle.build_tree(q_lde_l.T, q_lde_h.T, cap_height=cap_h)
    challenger.observe_cap(quot_tree.cap_ints())

    # ---- DEEP openings ----------------------------------------------------
    zeta = challenger.get_extension_challenge()
    w_zeta = ext_py.mul(zeta, ext_py.from_base(w))
    trace_at_zeta = eval_base_polys_at_ext(coeff_l, coeff_h, zeta)
    trace_at_zeta_next = eval_base_polys_at_ext(coeff_l, coeff_h, w_zeta)
    constants_at_zeta = []
    if K:
        constants_at_zeta = eval_base_polys_at_ext(*const_coeff, zeta)
    quot_at_zeta_flat = eval_base_polys_at_ext(ql, qh, zeta)
    # Q_k(ζ): the chunk rows are the c0/c1 coefficient vectors of an
    # extension-valued polynomial; combine the two base evaluations.
    quotient_at_zeta = []
    for k in range(chunks):
        e0 = quot_at_zeta_flat[2 * k]       # eval of c0-coeff poly at ζ (ext)
        e1 = quot_at_zeta_flat[2 * k + 1]   # eval of c1-coeff poly at ζ (ext)
        # Q_k(ζ) = e0 + x·e1 where x is the extension generator
        quotient_at_zeta.append(ext_py.add(e0, ext_py.mul((0, 1), e1)))

    for pair in (*trace_at_zeta, *trace_at_zeta_next, *constants_at_zeta,
                 *quotient_at_zeta):
        challenger.observe(pair[0])
        challenger.observe(pair[1])

    # ---- DEEP composition polynomial -------------------------------------
    gamma = challenger.get_extension_challenge()
    zeta_dev = _ext_from_pair(zeta)
    wzeta_dev = _ext_from_pair(w_zeta)
    x_ext = (xl, xh, jnp.zeros_like(xl), jnp.zeros_like(xh))
    inv_x_zeta = ge.inv(ge.sub(x_ext, tuple(
        jnp.broadcast_to(c, xl.shape) for c in zeta_dev)))
    inv_x_wzeta = ge.inv(ge.sub(x_ext, tuple(
        jnp.broadcast_to(c, xl.shape) for c in wzeta_dev)))

    L = ge.zeros(xl.shape)
    g_pow = ext_py.ONE

    def accumulate(L, g_pow, col_l, col_h, opened, inv_den):
        diff = ge.sub((col_l, col_h, jnp.zeros_like(col_l),
                       jnp.zeros_like(col_h)),
                      tuple(jnp.broadcast_to(c, col_l.shape)
                            for c in _ext_from_pair(opened)))
        term = ge.mul(diff, inv_den)
        term = ge.mul(term, tuple(jnp.broadcast_to(c, col_l.shape)
                                  for c in _ext_from_pair(g_pow)))
        return ge.add(L, term)

    for j in range(W):
        L = accumulate(L, g_pow, tr_lde_l[j], tr_lde_h[j],
                       trace_at_zeta[j], inv_x_zeta)
        g_pow = ext_py.mul(g_pow, gamma)
    for j in range(W):
        L = accumulate(L, g_pow, tr_lde_l[j], tr_lde_h[j],
                       trace_at_zeta_next[j], inv_x_wzeta)
        g_pow = ext_py.mul(g_pow, gamma)
    for k in range(K):
        cll, clh = const_lde
        L = accumulate(L, g_pow, cll[k], clh[k], constants_at_zeta[k],
                       inv_x_zeta)
        g_pow = ext_py.mul(g_pow, gamma)
    for k in range(chunks):
        # Q_k columns are stored as two base columns; Q_k(x) = c0(x) + X·c1(x)
        qk = (q_lde_l[2 * k], q_lde_h[2 * k],
              q_lde_l[2 * k + 1], q_lde_h[2 * k + 1])
        diff = ge.sub(qk, tuple(jnp.broadcast_to(c, xl.shape)
                                for c in _ext_from_pair(quotient_at_zeta[k])))
        term = ge.mul(diff, inv_x_zeta)
        term = ge.mul(term, tuple(jnp.broadcast_to(c, xl.shape)
                                  for c in _ext_from_pair(g_pow)))
        L = ge.add(L, term)
        g_pow = ext_py.mul(g_pow, gamma)

    # ---- FRI --------------------------------------------------------------
    fri_proof, layers, codewords = fri_prove(L, log_N, gl.GENERATOR,
                                             config.fri, challenger)
    indices = derive_query_indices(challenger, log_N,
                                   config.fri.num_queries)
    fri_proof.query_rounds = [open_query(layers, codewords, i)
                              for i in indices]

    # per-query openings of the trace/quotient trees
    tr_host_l = gl.to_u64(tr_lde_l, tr_lde_h)      # (W, N) uint64
    q_host = gl.to_u64(q_lde_l, q_lde_h)           # (2*chunks, N)
    c_host = gl.to_u64(*const_lde) if K else None
    trace_openings = []
    quotient_openings = []
    constants_openings = []
    for q in indices:
        trace_openings.append(TreeOpening(
            leaf=[int(x) for x in tr_host_l[:, q]],
            path=trace_tree.open(q)))
        quotient_openings.append(TreeOpening(
            leaf=[int(x) for x in q_host[:, q]],
            path=quot_tree.open(q)))
        if K:
            constants_openings.append(TreeOpening(
                leaf=[int(x) for x in c_host[:, q]],
                path=const_tree.open(q)))

    return StarkProof(
        trace_cap=trace_tree.cap_ints(),
        quotient_cap=quot_tree.cap_ints(),
        trace_at_zeta=trace_at_zeta,
        trace_at_zeta_next=trace_at_zeta_next,
        quotient_at_zeta=quotient_at_zeta,
        fri_proof=fri_proof,
        trace_openings=trace_openings,
        quotient_openings=quotient_openings,
        constants_at_zeta=constants_at_zeta,
        constants_openings=constants_openings,
    )
