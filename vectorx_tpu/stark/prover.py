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

import jax
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
from vectorx_tpu.stark.air import (NUM_LOOKUP_SETS, Air, DeviceAlgebra,
                                   bus_aux_layout, bus_transitions,
                                   lookup_boundaries, lookup_transitions)

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
    aux_cap: list = field(default_factory=list)            # lookup Z columns
    aux_at_zeta: list = field(default_factory=list)
    aux_at_zeta_next: list = field(default_factory=list)
    aux_openings: list = field(default_factory=list)


# Peak-HBM knob for wide-trace LDEs: transforms over a (rows, N) limb
# array run in row blocks of ~2^LDE_CHUNK_ELEMS elements, so butterfly
# temporaries stay bounded no matter how wide the AIR is (the machine
# verifier-VM at production FRI security reaches 50 constant columns ×
# multi-million-point domains — an unchunked transform OOMs a v5e chip).
LDE_CHUNK_ELEMS = 1 << 26


def _rows_chunked(fn, lo, hi, out_cols: int):
    """Apply `fn(lo_block, hi_block) -> (lo', hi')` over row blocks sized
    so block_rows · out_cols ≤ LDE_CHUNK_ELEMS.  Bit-identical to one
    full-width call — the transform is independent per row."""
    rows = lo.shape[0]
    block = max(1, LDE_CHUNK_ELEMS // max(1, out_cols))
    if rows <= block:
        return fn(lo, hi)
    outs = [fn(lo[s:s + block], hi[s:s + block])
            for s in range(0, rows, block)]
    return (jnp.concatenate([o[0] for o in outs], axis=0),
            jnp.concatenate([o[1] for o in outs], axis=0))


def _intt_rows(lo, hi):
    return _rows_chunked(intt, lo, hi, lo.shape[-1])


def _coset_lde_rows(cl, ch, N: int):
    """coeffs (rows, n) -> coset evaluations (rows, N), row-chunked."""
    n = cl.shape[-1]

    def one(a, b):
        pad = ((0, 0), (0, N - n))
        return coset_ntt(jnp.pad(a, pad), jnp.pad(b, pad))

    return _rows_chunked(one, cl, ch, N)


# Streamed-prover trigger: when the standing LDE matrices (trace + aux +
# constants + quotient chunks, each over the blown-up domain) would exceed
# this many limb elements (×8 bytes for the lo/hi uint32 pair), the prover
# switches to the coset-streamed schedule: every full-domain quantity is
# computed one stride-`blowup` coset at a time (1/blowup peak memory),
# commitments are built from interleaved per-coset leaf digests, and the
# proof bytes are BIT-IDENTICAL to the unstreamed path (regression-tested).
# 2^29 limb pairs ≈ 4 GB standing — headroom for temporaries on a 16 GB v5e.
STREAM_THRESHOLD_ELEMS = 1 << 29


def _commit_cols(air: Air) -> int:
    _, _, A = bus_aux_layout(air)
    return (air.width + A + air.constant_columns().shape[0]
            + 2 * _num_quotient_chunks(air))


def _use_streaming(air: Air, config: "StarkConfig") -> bool:
    import os

    mode = os.environ.get("VECTORX_STREAM_PROVER", "auto")
    if mode in ("1", "true"):
        return True
    if mode in ("0", "false"):
        return False
    N = air.n << config.rate_bits
    return _commit_cols(air) * N > STREAM_THRESHOLD_ELEMS


def _coset_shift(c: int, log_N: int) -> int:
    """Shift of the c-th stride-`blowup` coset: LDE index j = blowup·t + c
    is the point g·w_N^c·w_n^t."""
    return (gl.GENERATOR * pow(_root_of_unity(log_N, inverse=False), c, P)) % P


def _coset_evals(cl, ch, c: int, log_N: int):
    """Evaluations of degree-<n rows on coset c, (rows, n)."""
    s = _coset_shift(c, log_N)
    return _rows_chunked(lambda a, b: coset_ntt(a, b, s), cl, ch,
                         cl.shape[-1])


def _interleave_cosets(parts):
    """[(n,) per coset c=0..blowup-1] -> (N,) in LDE natural order."""
    return jnp.stack(parts, axis=-1).reshape(-1)


def _commit_streamed(cl, ch, log_N: int, cap_h: int):
    """Merkle tree over the LDE leaves of coefficient rows (rows, n),
    built one coset at a time: hash each coset's n leaves, interleave the
    digests (leaf j = blowup·t + c ↔ coset c position t), build layers."""
    blowup = (1 << log_N) // cl.shape[-1]
    dls, dhs = [], []
    for c in range(blowup):
        el, eh = _coset_evals(cl, ch, c, log_N)
        dl, dh = merkle.hash_leaves(el.T, eh.T)
        dls.append(dl)
        dhs.append(dh)
    lo = jnp.stack(dls, axis=1).reshape(1 << log_N, -1)
    hi = jnp.stack(dhs, axis=1).reshape(1 << log_N, -1)
    return merkle.build_tree_from_digests(lo, hi, cap_height=cap_h)


def preprocess(air: Air, config: "StarkConfig"):
    """Build the preprocessed-columns commitment (the AIR's "verification
    key").  Deterministic; prover and verifier both derive it.  Returns
    (tree or None, lde (lo, hi) or None, coeff (lo, hi) or None); the lde
    entry is None on the streamed path (callers recompute per coset)."""
    consts = air.constant_columns()
    if consts.shape[0] == 0:
        return None, None, None
    n = air.n
    N = n << config.rate_bits
    cl, ch = gl.from_u64(consts)
    kl, kh = _intt_rows(cl, ch)
    if _use_streaming(air, config):
        tree = _commit_streamed(kl, kh, air.log_n + config.rate_bits,
                                config.fri.cap_height)
        return tree, None, (kl, kh)
    ll, lh = _coset_lde_rows(kl, kh, N)
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


def _sum_rows(lo, hi):
    """Field-sum a (B, N) limb array over axis 0 (pairwise tree reduce)."""
    while lo.shape[0] > 1:
        half = lo.shape[0] // 2
        sl, sh = gl.add(lo[:half], hi[:half], lo[half:2 * half],
                        hi[half:2 * half])
        if lo.shape[0] % 2:
            sl = jnp.concatenate([sl, lo[-1:]], axis=0)
            sh = jnp.concatenate([sh, hi[-1:]], axis=0)
        lo, hi = sl, sh
    return lo[0], hi[0]


def ext_power_table_dev(zeta, count):
    """[ζ^0 .. ζ^(count-1)] as a device ext array, by doubling:
    P_{2k} = P_k ++ P_k·ζ^k (log₂(count) device passes; the ζ^(2^i) seeds
    are scalar host muls)."""
    tab = ge.from_pair_u64(np.array([1], dtype=np.uint64),
                           np.array([0], dtype=np.uint64))
    cur = zeta  # ζ^(len(tab)) as the table doubles
    while tab[0].shape[0] < count:
        f = _ext_from_pair(cur)
        shifted = ge.mul(tab, tuple(jnp.broadcast_to(c, tab[0].shape)
                                    for c in f))
        tab = tuple(jnp.concatenate([a, b]) for a, b in zip(tab, shifted))
        cur = ext_py.mul(cur, cur)
    return tuple(a[:count] for a in tab)


def eval_base_polys_at_ext(coeff_lo, coeff_hi, zeta):
    """Evaluate base-field polynomials (W, n) at an extension point ζ.
    Returns W (c0, c1) int pairs.  Device dot against a ζ-power table."""
    n = coeff_lo.shape[-1]
    z0l, z0h, z1l, z1h = ext_power_table_dev(zeta, n)

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


def _zh_values(air: Air, config: StarkConfig):
    """Z_H(x) = x^n − 1 is constant on each stride-`blowup` coset of the
    LDE domain (x^n depends only on j mod blowup).  Returns (vals, invs)
    Python int lists of length blowup, indexed by coset c = j % blowup."""
    n = air.n
    blowup = 1 << config.rate_bits
    w8 = _root_of_unity(air.log_n + config.rate_bits, inverse=False)
    z8 = pow(w8, n, P)  # order `blowup`
    g_n = pow(gl.GENERATOR, n, P)
    vals = [(g_n * pow(z8, i, P) - 1) % P for i in range(blowup)]
    invs = [pow(v, P - 2, P) for v in vals]
    return vals, invs


def _zh_on_domain(air: Air, config: StarkConfig):
    """Z_H(x) = x^n - 1 on the LDE coset: period-`blowup` values, tiled.
    Returns (zh_lo, zh_hi, zh_inv_lo, zh_inv_hi) arrays of length N."""
    n = air.n
    blowup = 1 << config.rate_bits
    N = n * blowup
    vals, invs = _zh_values(air, config)
    tile = N // blowup
    zh = np.tile(np.array(vals, dtype=np.uint64), tile)[:N]
    zhi = np.tile(np.array(invs, dtype=np.uint64), tile)[:N]
    # note: np.tile repeats the 8-long pattern; domain order has period 8 ✓
    return (*gl.from_u64(zh), *gl.from_u64(zhi))


def _field_exclusive_prefix_sum(cl, ch):
    """Exclusive prefix sum along the last axis in GF(p): Hillis-Steele
    inclusive scan (log n shifted adds, all on device), then shift by one."""
    n = cl.shape[-1]
    d = 1
    while d < n:
        zl = jnp.zeros_like(cl[..., :d])
        sl = jnp.concatenate([zl, cl[..., :-d]], axis=-1)
        sh = jnp.concatenate([jnp.zeros_like(zl), ch[..., :-d]], axis=-1)
        cl, ch = gl.add(cl, ch, sl, sh)
        d *= 2
    zl = jnp.zeros_like(cl[..., :1])
    return (jnp.concatenate([zl, cl[..., :-1]], axis=-1),
            jnp.concatenate([jnp.zeros_like(zl), ch[..., :-1]], axis=-1))


def lookup_aux_trace(air: Air, tl, th, consts_u64, betas) -> np.ndarray:
    """Witness-generate the LogUp running-sum columns Z_{l,s} as a
    (num_lookups·NUM_LOOKUP_SETS, n) uint64 array.

    Z_{l,s}[i] = Σ_{r<i} [ Σ_j 1/(β_s − a_j[r]) − m[r]/(β_s − t[r]) ]

    All inversions run as ONE batched device `gl.inv`; the prefix sum is a
    log-depth device scan."""
    lookups = air.lookups()
    dens_l, dens_h = [], []
    for lk in lookups:
        t_l, t_h = gl.from_u64(np.asarray(consts_u64[lk.table],
                                          dtype=np.uint64))
        for beta in betas:
            bl = jnp.uint32(beta & 0xFFFFFFFF)
            bh = jnp.uint32(beta >> 32)
            for j in lk.inputs:
                d = gl.sub(bl, bh, tl[j], th[j])
                dens_l.append(d[0])
                dens_h.append(d[1])
            d = gl.sub(bl, bh, t_l, t_h)
            dens_l.append(d[0])
            dens_h.append(d[1])
    inv_l, inv_h = gl.inv(jnp.stack(dens_l), jnp.stack(dens_h))
    rows_l, rows_h = [], []
    k = 0
    for lk in lookups:
        m_l, m_h = tl[lk.multiplicity], th[lk.multiplicity]
        for _ in betas:
            ni = len(lk.inputs)
            cl = inv_l[k]
            chh = inv_h[k]
            for j in range(1, ni):
                cl, chh = gl.add(cl, chh, inv_l[k + j], inv_h[k + j])
            mt = gl.mul(m_l, m_h, inv_l[k + ni], inv_h[k + ni])
            cl, chh = gl.sub(cl, chh, *mt)
            k += ni + 1
            rows_l.append(cl)
            rows_h.append(chh)
    zl, zh = _field_exclusive_prefix_sum(jnp.stack(rows_l),
                                         jnp.stack(rows_h))
    return np.asarray(gl.to_u64(zl, zh))


def bus_aux_trace(air: Air, tl, th, consts_u64, betas, deltas) -> np.ndarray:
    """Witness-generate the bus helper and running-sum columns as a
    ((P+1)·NUM_LOOKUP_SETS, n) uint64 array: helpers h_{p,s} at p·S + s,
    running sums Z_s at P·S + s.  One batched device inverse for all
    denominators; Z is a log-depth device scan."""
    ports = air.bus_ports()
    S = NUM_LOOKUP_SETS
    dens_l, dens_h = [], []
    ms = []
    for p, port in enumerate(ports):
        a_l, a_h = gl.from_u64(np.asarray(consts_u64[port.addr_col],
                                          dtype=np.uint64))
        v0l = jnp.roll(tl[port.value_cols[0]], -1)
        v0h = jnp.roll(th[port.value_cols[0]], -1)
        v1l = jnp.roll(tl[port.value_cols[1]], -1)
        v1h = jnp.roll(th[port.value_cols[1]], -1)
        m_l, m_h = gl.from_u64(np.asarray(consts_u64[port.mult_col],
                                          dtype=np.uint64))
        ms.append((m_l, m_h))
        for beta, delta in zip(betas, deltas):
            d2 = (delta * delta) % P
            t1 = gl.mul(v0l, v0h, jnp.uint32(delta & 0xFFFFFFFF),
                        jnp.uint32(delta >> 32))
            t2 = gl.mul(v1l, v1h, jnp.uint32(d2 & 0xFFFFFFFF),
                        jnp.uint32(d2 >> 32))
            cmp_ = gl.add(*gl.add(a_l, a_h, *t1), *t2)
            d = gl.sub(jnp.uint32(beta & 0xFFFFFFFF),
                       jnp.uint32(beta >> 32), *cmp_)
            dens_l.append(d[0])
            dens_h.append(d[1])
    inv_l, inv_h = gl.inv(jnp.stack(dens_l), jnp.stack(dens_h))
    n = air.n
    out = np.zeros(((len(ports) + 1) * S, n), dtype=np.uint64)
    hs = {}
    for p in range(len(ports)):
        for s in range(S):
            h = gl.mul(*ms[p], inv_l[p * S + s], inv_h[p * S + s])
            hs[(p, s)] = h
            out[p * S + s] = np.asarray(gl.to_u64(*h))
    for s in range(S):
        acc = hs[(0, s)]
        for p in range(1, len(ports)):
            acc = gl.add(*acc, *hs[(p, s)])
        z = _field_exclusive_prefix_sum(acc[0][None, :], acc[1][None, :])
        out[len(ports) * S + s] = np.asarray(gl.to_u64(z[0][0], z[1][0]))
    return out


def _use_jit_constraints() -> bool:
    """Jit the composition path?  Default: on for accelerators (the remote
    tunnel's ~26 ms/dispatch makes eager constraint graphs minutes-slow),
    off for CPU (XLA:CPU compile time is super-linear on wide AIRs and the
    eager path has no dispatch tax there).  Override with
    VECTORX_JIT_CONSTRAINTS=0/1."""
    import os

    mode = os.environ.get("VECTORX_JIT_CONSTRAINTS", "auto")
    if mode in ("1", "true"):
        return True
    if mode in ("0", "false"):
        return False
    return jax.devices()[0].platform != "cpu"


def _challenge_arrays(vals):
    """Fiat-Shamir challenges as (lo, hi) device arrays — traced inputs,
    so compiled composition graphs are challenge-independent."""
    v = np.array(vals, dtype=np.uint64).reshape(-1)
    return (jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((v >> np.uint64(32)).astype(np.uint32)))


def _boundary_value_arrays(boundaries):
    v = np.array([val for (_r, _c, val) in boundaries], dtype=np.uint64)
    return (jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
            jnp.asarray((v >> np.uint64(32)).astype(np.uint32)))


def _composition_core(air, public, boundaries, x_last, roll,
                      trl, trh, axl, axh, cll, clh,
                      alpha4, betas_pair, deltas_pair, bnd_v,
                      xl, xh, zh_l, zh_h):
    """acc(x) = Σ_i α^i·T_i(x)·(x−x_last) + Σ_b α^{n+b}·B_b(x)·Z_H(x)/(x−x_b)
    over the LDE domain, as (c0_lo, c0_hi, c1_lo, c1_hi).

    `roll` is the index distance of "the next trace row" in the given
    evaluation ordering: `blowup` on the full natural-order LDE domain, 1
    on a single stride-`blowup` coset (the streamed prover evaluates the
    identical polynomial identity coset-by-coset).

    Pure function of device inputs + the AIR SHAPE: challenge values and
    boundary values arrive as traced arrays, so the same compiled graph
    serves every proof of this shape."""
    blowup = roll
    W = trl.shape[0]
    A = axl.shape[0]
    K = cll.shape[0]
    N = trl.shape[1]
    lookups = air.lookups()
    ports = air.bus_ports()
    local = [(trl[j], trh[j]) for j in range(W)]
    nxt = [(jnp.roll(trl[j], -blowup), jnp.roll(trh[j], -blowup))
           for j in range(W)]
    consts_dev = [(cll[k], clh[k]) for k in range(K)] if K else None
    betas_p = [(betas_pair[0][s], betas_pair[1][s])
               for s in range(int(betas_pair[0].shape[0]))]
    deltas_p = [(deltas_pair[0][s], deltas_pair[1][s])
                for s in range(int(deltas_pair[0].shape[0]))]

    tvals = list(air.transition(DeviceAlgebra, local, nxt, public,
                                consts_dev))
    if lookups or ports:
        aux_local = [(axl[a], axh[a]) for a in range(A)]
        aux_nxt = [(jnp.roll(axl[a], -blowup), jnp.roll(axh[a], -blowup))
                   for a in range(A)]
        if lookups:
            tvals += lookup_transitions(DeviceAlgebra, local, nxt,
                                        aux_local, aux_nxt, consts_dev,
                                        betas_p, lookups)
        if ports:
            tvals += bus_transitions(DeviceAlgebra, local, nxt, aux_local,
                                     aux_nxt, consts_dev, betas_p,
                                     deltas_p, air)
    n_trans = len(tvals)
    n_bnd = len(boundaries)

    # α^0..α^(n_trans+n_bnd−1) in ONE device scan over the traced α
    one = ge.from_pair_u64(np.uint64(1), np.uint64(0))

    def _step(c, _):
        return ge.mul(c, alpha4), c

    _, tw = jax.lax.scan(_step, one, None, length=n_trans + n_bnd)
    tw = tuple(t.reshape(n_trans + n_bnd) for t in tw)

    xml, xmh = gl.sub(xl, xh, jnp.uint32(x_last & 0xFFFFFFFF),
                      jnp.uint32(x_last >> 32))
    # chunked along the constraint axis: O(CHUNK·N) live memory
    CHUNK = max(1, min(n_trans, (1 << 25) // max(1, N)))
    acc0 = acc1 = None
    for s in range(0, n_trans, CHUNK):
        e = min(s + CHUNK, n_trans)
        tsl = jnp.stack([t[0] for t in tvals[s:e]])
        tsh = jnp.stack([t[1] for t in tvals[s:e]])
        tsl, tsh = gl.mul(tsl, tsh, xml[None, :], xmh[None, :])
        c0 = _sum_rows(*gl.mul(tsl, tsh, tw[0][s:e, None], tw[1][s:e, None]))
        c1 = _sum_rows(*gl.mul(tsl, tsh, tw[2][s:e, None], tw[3][s:e, None]))
        acc0 = c0 if acc0 is None else gl.add(*acc0, *c0)
        acc1 = c1 if acc1 is None else gl.add(*acc1, *c1)
        tvals[s:e] = [None] * (e - s)   # free consumed buffers promptly
    acc = (*acc0, *acc1)

    if boundaries:
        w = _root_of_unity(air.log_n, inverse=False)
        rows_x = np.array([pow(w, row, P) for (row, _c, _v) in boundaries],
                          dtype=np.uint64)
        cols = [c for (_r, c, _v) in boundaries]
        xrl, xrh = gl.from_u64(rows_x)
        vl_, vh_ = bnd_v
        ap = tuple(t[n_trans:] for t in tw)
        dl, dh = gl.sub(xl[None, :], xh[None, :],
                        xrl[:, None], xrh[:, None])        # (B, N)
        dinv_l, dinv_h = gl.inv(dl, dh)
        # col index ≥ W addresses a lookup aux column (lookup_boundaries)
        pcl = jnp.stack([trl[c] if c < W else axl[c - W] for c in cols])
        pch = jnp.stack([trh[c] if c < W else axh[c - W] for c in cols])
        pl_, ph_ = gl.sub(pcl, pch, vl_[:, None], vh_[:, None])
        cl, ch = gl.mul(pl_, ph_, zh_l[None, :], zh_h[None, :])
        cl, ch = gl.mul(cl, ch, dinv_l, dinv_h)
        t0 = gl.mul(cl, ch, ap[0][:, None], ap[1][:, None])
        t1 = gl.mul(cl, ch, ap[2][:, None], ap[3][:, None])
        term = (_sum_rows(*t0), _sum_rows(*t1))
        acc = ge.add(acc, (*term[0], *term[1]))
    return acc


def _composition_jit(air, config, public, boundaries, x_last, roll=None):
    roll = roll if roll is not None else 1 << config.rate_bits

    def body(trl, trh, axl, axh, cll, clh, alpha4, betas_pair, deltas_pair,
             bnd_v, xl, xh, zh_l, zh_h):
        return _composition_core(air, public, boundaries, x_last, roll,
                                 trl, trh, axl, axh, cll, clh, alpha4,
                                 betas_pair, deltas_pair, bnd_v,
                                 xl, xh, zh_l, zh_h)

    return jax.jit(body)


def _composition_eager(air, config, public, boundaries, x_last, alpha,
                       betas, deltas, trl, trh, aux_lde, const_lde,
                       xl, xh, zh_l, zh_h):
    N = trl.shape[1]
    empty = (jnp.zeros((0, N), jnp.uint32), jnp.zeros((0, N), jnp.uint32))
    axl, axh = aux_lde if aux_lde is not None else empty
    cll, clh = const_lde if const_lde is not None else empty
    return _composition_core(
        air, public, boundaries, x_last, 1 << config.rate_bits,
        trl, trh, axl, axh, cll, clh, _ext_from_pair(alpha),
        _challenge_arrays(betas), _challenge_arrays(deltas),
        _boundary_value_arrays(boundaries), xl, xh, zh_l, zh_h)


def prove(air: Air, trace_u64: np.ndarray, config: StarkConfig = StarkConfig(),
          trace_sharding=None) -> StarkProof:
    """`trace_sharding`: an optional `jax.sharding.Sharding` for the (W, n)
    trace limb arrays — shard the DOMAIN axis over a mesh
    (`NamedSharding(mesh, P(None, axis))`) and every downstream stage
    (NTT/LDE, Merkle, composition, quotient, DEEP, FRI) runs GSPMD-
    partitioned with XLA-inserted collectives; the transcript and proof
    are bit-identical to the unsharded run (parallel/sharded_prove.py)."""
    n = air.n
    W = air.width
    assert trace_u64.shape == (W, n)
    if trace_sharding is None and _use_streaming(air, config):
        return prove_streamed(air, trace_u64, config)
    blowup = 1 << config.rate_bits
    N = n * blowup
    log_N = air.log_n + config.rate_bits
    cap_h = config.fri.cap_height
    challenger = Challenger()
    public = air.public_inputs()
    challenger.observe_many(public)

    # ---- preprocessed (constant) columns ---------------------------------
    const_tree, const_lde, const_coeff = preprocess(air, config)
    if const_tree is not None and const_lde is None:
        # preprocess streamed its commitment (huge AIR) but this path was
        # forced (e.g. trace_sharding): materialize the LDE it skipped
        const_lde = _coset_lde_rows(*const_coeff, N)
    if const_tree is not None:
        challenger.observe_cap(const_tree.cap_ints())
    K = air.constant_columns().shape[0]

    # ---- trace commit -----------------------------------------------------
    tl, th = gl.from_u64(trace_u64)                  # (W, n)
    if trace_sharding is not None:
        tl = jax.device_put(tl, trace_sharding)
        th = jax.device_put(th, trace_sharding)
    coeff_l, coeff_h = _intt_rows(tl, th)            # keep coefficients
    pad = ((0, 0), (0, N - n))
    tr_lde_l, tr_lde_h = _coset_lde_rows(coeff_l, coeff_h, N)   # (W, N)
    trace_tree = merkle.build_tree(tr_lde_l.T, tr_lde_h.T, cap_height=cap_h)
    challenger.observe_cap(trace_tree.cap_ints())

    # ---- lookup/bus aux columns (committed after post-trace challenges) ---
    lookups = air.lookups()
    ports = air.bus_ports()
    _, _, A = bus_aux_layout(air)
    betas: list[int] = []
    deltas: list[int] = []
    aux_tree = aux_lde = aux_coeff = None
    if lookups or ports:
        assert K, "lookup tables / bus addresses live in constant_columns()"
        if lookups:
            assert air.constraint_degree >= max(lk.degree for lk in lookups), \
                "constraint_degree must cover the synthesized lookup constraints"
        betas = challenger.get_n_challenges(NUM_LOOKUP_SETS)
        if ports:
            deltas = challenger.get_n_challenges(NUM_LOOKUP_SETS)
        consts_u64 = air.constant_columns()
        parts = []
        if lookups:
            parts.append(lookup_aux_trace(air, tl, th, consts_u64, betas))
        if ports:
            parts.append(bus_aux_trace(air, tl, th, consts_u64, betas,
                                       deltas))
        aux_u64 = np.concatenate(parts, axis=0)
        axl, axh = gl.from_u64(aux_u64)
        aux_coeff = _intt_rows(axl, axh)
        aux_lde = _coset_lde_rows(aux_coeff[0], aux_coeff[1], N)
        aux_tree = merkle.build_tree(aux_lde[0].T, aux_lde[1].T,
                                     cap_height=cap_h)
        challenger.observe_cap(aux_tree.cap_ints())

    # ---- constraint composition ------------------------------------------
    alpha = challenger.get_extension_challenge()
    xl, xh = _domain_x(log_N, gl.GENERATOR)
    zh_l, zh_h, zhinv_l, zhinv_h = _zh_on_domain(air, config)
    w = _root_of_unity(air.log_n, inverse=False)
    x_last = pow(w, n - 1, P)
    boundaries = list(air.boundaries(public)) + \
        (lookup_boundaries(air) if (lookups or ports) else [])

    if _use_jit_constraints():
        # One compiled graph for the whole composition: on the remote-TPU
        # tunnel the eager path pays ~26 ms dispatch latency per op across
        # thousands of constraint ops (VERDICT round-2 item 4).  Challenges
        # (α, βs, δs) and boundary values are TRACED inputs so the graph —
        # and the persistent compile cache entry — depends only on the AIR
        # shape, never on Fiat-Shamir values.
        acc = _composition_jit(air, config, public, boundaries, x_last)(
            tr_lde_l, tr_lde_h,
            aux_lde[0] if (lookups or ports) else jnp.zeros((0, N), jnp.uint32),
            aux_lde[1] if (lookups or ports) else jnp.zeros((0, N), jnp.uint32),
            const_lde[0] if K else jnp.zeros((0, N), jnp.uint32),
            const_lde[1] if K else jnp.zeros((0, N), jnp.uint32),
            _ext_from_pair(alpha),
            _challenge_arrays(betas), _challenge_arrays(deltas),
            _boundary_value_arrays(boundaries),
            xl, xh, zh_l, zh_h)
    else:
        acc = _composition_eager(
            air, config, public, boundaries, x_last, alpha, betas, deltas,
            tr_lde_l, tr_lde_h, aux_lde, const_lde, xl, xh, zh_l, zh_h)

    # ---- quotient ---------------------------------------------------------
    q0 = gl.mul(acc[0], acc[1], zhinv_l, zhinv_h)
    q1 = gl.mul(acc[2], acc[3], zhinv_l, zhinv_h)
    del acc
    qc0 = coset_intt(*q0)
    qc1 = coset_intt(*q1)
    del q0, q1
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
    aux_at_zeta = []
    aux_at_zeta_next = []
    if lookups or ports:
        aux_at_zeta = eval_base_polys_at_ext(*aux_coeff, zeta)
        aux_at_zeta_next = eval_base_polys_at_ext(*aux_coeff, w_zeta)
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

    for pair in (*trace_at_zeta, *trace_at_zeta_next, *aux_at_zeta,
                 *aux_at_zeta_next, *constants_at_zeta, *quotient_at_zeta):
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

    # γ powers for every opened polynomial, in transcript order
    n_polys = 2 * W + 2 * A + K + chunks
    g_pows = []
    g_pow = ext_py.ONE
    for _ in range(n_polys):
        g_pows.append(g_pow)
        g_pow = ext_py.mul(g_pow, gamma)

    def _weights(pairs):
        import numpy as _np

        return ge.from_pair_u64(
            _np.array([p[0] for p in pairs], dtype=_np.uint64),
            _np.array([p[1] for p in pairs], dtype=_np.uint64))

    def dotc(gps, opened):
        c = ext_py.ZERO
        for gp, y in zip(gps, opened):
            c = ext_py.add(c, ext_py.mul(gp, y))
        return c

    def base_group(cols_l, cols_h, weights, scalar_sum, inv_den):
        """Σ_j γ_j (P_j(x) − y_j) · inv_den for base-field columns, by
        linearity: weighted column-sums, chunked along the column axis to
        bound live HBM at recursion-scale domains."""
        w0l, w0h, w1l, w1h = weights
        B = cols_l.shape[0]
        CH = max(1, min(B, (1 << 25) // max(1, N)))
        s0 = s1 = None
        for s in range(0, B, CH):
            e = min(s + CH, B)
            c0 = _sum_rows(*gl.mul(cols_l[s:e], cols_h[s:e],
                                   w0l[s:e, None], w0h[s:e, None]))
            c1 = _sum_rows(*gl.mul(cols_l[s:e], cols_h[s:e],
                                   w1l[s:e, None], w1h[s:e, None]))
            s0 = c0 if s0 is None else gl.add(*s0, *c0)
            s1 = c1 if s1 is None else gl.add(*s1, *c1)
        diff = ge.sub((*s0, *s1), tuple(
            jnp.broadcast_to(v, s0[0].shape)
            for v in _ext_from_pair(scalar_sum)))
        return ge.mul(diff, inv_den)

    L = ge.zeros(xl.shape)
    L = ge.add(L, base_group(tr_lde_l, tr_lde_h, _weights(g_pows[:W]),
                             dotc(g_pows[:W], trace_at_zeta), inv_x_zeta))
    L = ge.add(L, base_group(tr_lde_l, tr_lde_h, _weights(g_pows[W:2 * W]),
                             dotc(g_pows[W:2 * W], trace_at_zeta_next),
                             inv_x_wzeta))
    if lookups or ports:
        ga = g_pows[2 * W:2 * W + A]
        gb = g_pows[2 * W + A:2 * W + 2 * A]
        L = ge.add(L, base_group(aux_lde[0], aux_lde[1], _weights(ga),
                                 dotc(ga, aux_at_zeta), inv_x_zeta))
        L = ge.add(L, base_group(aux_lde[0], aux_lde[1], _weights(gb),
                                 dotc(gb, aux_at_zeta_next), inv_x_wzeta))
    if K:
        cll, clh = const_lde
        kg = g_pows[2 * W + 2 * A:2 * W + 2 * A + K]
        L = ge.add(L, base_group(cll, clh, _weights(kg),
                                 dotc(kg, constants_at_zeta), inv_x_zeta))
    # quotient chunks (extension-valued columns)
    qg = g_pows[2 * W + 2 * A + K:]
    qw = _weights(qg)
    qc0l, qc0h = q_lde_l[0::2], q_lde_h[0::2]     # (chunks, N) c0 parts
    qc1l, qc1h = q_lde_l[1::2], q_lde_h[1::2]     # (chunks, N) c1 parts
    # ext·ext product components: (a0b0 + 7·a1b1, a0b1 + a1b0)
    t00 = gl.mul(qc0l, qc0h, qw[0][:, None], qw[1][:, None])
    t11 = gl.mul(qc1l, qc1h, qw[2][:, None], qw[3][:, None])
    t01 = gl.mul(qc1l, qc1h, qw[0][:, None], qw[1][:, None])
    t10 = gl.mul(qc0l, qc0h, qw[2][:, None], qw[3][:, None])
    s_c0 = _sum_rows(*gl.add(*t00, *gl.mul_small(*t11, ge.W)))
    s_c1 = _sum_rows(*gl.add(*t01, *t10))
    qc = ext_py.ZERO
    for gp, y in zip(qg, quotient_at_zeta):
        qc = ext_py.add(qc, ext_py.mul(gp, y))
    qdiff = ge.sub((*s_c0, *s_c1), tuple(
        jnp.broadcast_to(v, s_c0[0].shape) for v in _ext_from_pair(qc)))
    L = ge.add(L, ge.mul(qdiff, inv_x_zeta))

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
    a_host = gl.to_u64(*aux_lde) if (lookups or ports) else None
    trace_openings = []
    quotient_openings = []
    constants_openings = []
    aux_openings = []
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
        if lookups or ports:
            aux_openings.append(TreeOpening(
                leaf=[int(x) for x in a_host[:, q]],
                path=aux_tree.open(q)))

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
        aux_cap=aux_tree.cap_ints() if (lookups or ports) else [],
        aux_at_zeta=aux_at_zeta,
        aux_at_zeta_next=aux_at_zeta_next,
        aux_openings=aux_openings,
    )


def prove_streamed(air: Air, trace_u64: np.ndarray,
                   config: StarkConfig = StarkConfig()) -> StarkProof:
    """Coset-streamed prover: BIT-IDENTICAL proofs to `prove`, with peak
    device memory ~1/blowup of the standing-LDE schedule.

    The LDE domain decomposes into `blowup` stride-`blowup` cosets: index
    j = blowup·t + c is the point g·w_N^c·w_n^t.  Every full-domain stage
    (leaf hashing, constraint composition, DEEP) is evaluated one coset at
    a time as a size-n transform — "the next trace row" is roll-1 within a
    coset — and only (N,)-sized single polynomials (composition accumulator,
    DEEP codeword) and digest layers are ever materialized at full size.
    This is what lets the verifier-VM machine AIR (105 committed columns ×
    multi-million-row traces at production FRI security) prove on one v5e
    chip.  Selected automatically by `prove` past STREAM_THRESHOLD_ELEMS;
    force with VECTORX_STREAM_PROVER=1/0."""
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

    # ---- preprocessed (constant) columns ----------------------------------
    const_tree, _, const_coeff = preprocess(air, config)
    if const_tree is not None:
        challenger.observe_cap(const_tree.cap_ints())
    K = air.constant_columns().shape[0]

    # ---- trace commit ------------------------------------------------------
    tl, th = gl.from_u64(trace_u64)
    coeff_l, coeff_h = _intt_rows(tl, th)
    trace_tree = _commit_streamed(coeff_l, coeff_h, log_N, cap_h)
    challenger.observe_cap(trace_tree.cap_ints())

    # ---- lookup/bus aux columns -------------------------------------------
    lookups = air.lookups()
    ports = air.bus_ports()
    _, _, A = bus_aux_layout(air)
    betas: list[int] = []
    deltas: list[int] = []
    aux_tree = aux_coeff = None
    if lookups or ports:
        assert K, "lookup tables / bus addresses live in constant_columns()"
        if lookups:
            assert air.constraint_degree >= max(lk.degree for lk in lookups)
        betas = challenger.get_n_challenges(NUM_LOOKUP_SETS)
        if ports:
            deltas = challenger.get_n_challenges(NUM_LOOKUP_SETS)
        consts_u64 = air.constant_columns()
        parts = []
        if lookups:
            parts.append(lookup_aux_trace(air, tl, th, consts_u64, betas))
        if ports:
            parts.append(bus_aux_trace(air, tl, th, consts_u64, betas,
                                       deltas))
        aux_u64 = np.concatenate(parts, axis=0)
        axl, axh = gl.from_u64(aux_u64)
        aux_coeff = _intt_rows(axl, axh)
        aux_tree = _commit_streamed(aux_coeff[0], aux_coeff[1], log_N, cap_h)
        challenger.observe_cap(aux_tree.cap_ints())

    # ---- constraint composition, coset by coset ---------------------------
    alpha = challenger.get_extension_challenge()
    w = _root_of_unity(air.log_n, inverse=False)
    x_last = pow(w, n - 1, P)
    boundaries = list(air.boundaries(public)) + \
        (lookup_boundaries(air) if (lookups or ports) else [])
    zh_vals, zh_invs = _zh_values(air, config)
    comp = _composition_jit(air, config, public, boundaries, x_last, roll=1)
    wt_l, wt_h = power_table(w, n)   # w_n^t table, shared by every coset
    wt_l = jnp.asarray(wt_l)
    wt_h = jnp.asarray(wt_h)
    empty = (jnp.zeros((0, n), jnp.uint32), jnp.zeros((0, n), jnp.uint32))
    alpha4 = _ext_from_pair(alpha)
    betas_pair = _challenge_arrays(betas)
    deltas_pair = _challenge_arrays(deltas)
    bnd_v = _boundary_value_arrays(boundaries)

    def coset_x(c):
        s = _coset_shift(c, log_N)
        return gl.mul(wt_l, wt_h, jnp.uint32(s & 0xFFFFFFFF),
                      jnp.uint32(s >> 32))

    def scalar_fill(v):
        return (jnp.full((n,), v & 0xFFFFFFFF, jnp.uint32),
                jnp.full((n,), v >> 32, jnp.uint32))

    acc_parts = [[], [], [], []]
    for c in range(blowup):
        e_tr = _coset_evals(coeff_l, coeff_h, c, log_N)
        e_ax = _coset_evals(*aux_coeff, c, log_N) if aux_coeff else empty
        e_cl = _coset_evals(*const_coeff, c, log_N) if K else empty
        xl_c, xh_c = coset_x(c)
        zh_c = scalar_fill(zh_vals[c])
        acc_c = comp(e_tr[0], e_tr[1], e_ax[0], e_ax[1], e_cl[0], e_cl[1],
                     alpha4, betas_pair, deltas_pair, bnd_v,
                     xl_c, xh_c, zh_c[0], zh_c[1])
        for i in range(4):
            acc_parts[i].append(acc_c[i])
    acc = tuple(_interleave_cosets(p) for p in acc_parts)

    # ---- quotient ----------------------------------------------------------
    _, _, zhinv_l, zhinv_h = _zh_on_domain(air, config)
    q0 = gl.mul(acc[0], acc[1], zhinv_l, zhinv_h)
    q1 = gl.mul(acc[2], acc[3], zhinv_l, zhinv_h)
    del acc
    qc0 = coset_intt(*q0)
    qc1 = coset_intt(*q1)
    del q0, q1
    chunks = _num_quotient_chunks(air)
    c0_host = gl.to_u64(*qc0)
    c1_host = gl.to_u64(*qc1)
    assert np.all(c0_host[chunks * n:] == 0) and \
        np.all(c1_host[chunks * n:] == 0), \
        "composition polynomial exceeds quotient degree bound"
    qcoef = np.zeros((2 * chunks, n), dtype=np.uint64)
    for k in range(chunks):
        qcoef[2 * k] = c0_host[k * n:(k + 1) * n]
        qcoef[2 * k + 1] = c1_host[k * n:(k + 1) * n]
    ql, qh = gl.from_u64(qcoef)
    quot_tree = _commit_streamed(ql, qh, log_N, cap_h)
    challenger.observe_cap(quot_tree.cap_ints())

    # ---- DEEP openings at ζ (coefficient-side, identical to `prove`) ------
    zeta = challenger.get_extension_challenge()
    w_zeta = ext_py.mul(zeta, ext_py.from_base(w))
    trace_at_zeta = eval_base_polys_at_ext(coeff_l, coeff_h, zeta)
    trace_at_zeta_next = eval_base_polys_at_ext(coeff_l, coeff_h, w_zeta)
    aux_at_zeta = []
    aux_at_zeta_next = []
    if lookups or ports:
        aux_at_zeta = eval_base_polys_at_ext(*aux_coeff, zeta)
        aux_at_zeta_next = eval_base_polys_at_ext(*aux_coeff, w_zeta)
    constants_at_zeta = []
    if K:
        constants_at_zeta = eval_base_polys_at_ext(*const_coeff, zeta)
    quot_at_zeta_flat = eval_base_polys_at_ext(ql, qh, zeta)
    quotient_at_zeta = []
    for k in range(chunks):
        e0 = quot_at_zeta_flat[2 * k]
        e1 = quot_at_zeta_flat[2 * k + 1]
        quotient_at_zeta.append(ext_py.add(e0, ext_py.mul((0, 1), e1)))
    for pair in (*trace_at_zeta, *trace_at_zeta_next, *aux_at_zeta,
                 *aux_at_zeta_next, *constants_at_zeta, *quotient_at_zeta):
        challenger.observe(pair[0])
        challenger.observe(pair[1])

    # ---- DEEP composition polynomial, coset by coset ----------------------
    gamma = challenger.get_extension_challenge()
    zeta_dev = _ext_from_pair(zeta)
    wzeta_dev = _ext_from_pair(w_zeta)
    n_polys = 2 * W + 2 * A + K + chunks
    g_pows = []
    g_pow = ext_py.ONE
    for _ in range(n_polys):
        g_pows.append(g_pow)
        g_pow = ext_py.mul(g_pow, gamma)

    def _weights(pairs):
        return ge.from_pair_u64(
            np.array([p[0] for p in pairs], dtype=np.uint64),
            np.array([p[1] for p in pairs], dtype=np.uint64))

    def dotc(gps, opened):
        cacc = ext_py.ZERO
        for gp, y in zip(gps, opened):
            cacc = ext_py.add(cacc, ext_py.mul(gp, y))
        return cacc

    def base_group_c(cols_l, cols_h, weights, scalar_sum, inv_den):
        w0l, w0h, w1l, w1h = weights
        B = cols_l.shape[0]
        CH = max(1, min(B, (1 << 25) // max(1, n)))
        s0 = s1 = None
        for s in range(0, B, CH):
            e = min(s + CH, B)
            c0 = _sum_rows(*gl.mul(cols_l[s:e], cols_h[s:e],
                                   w0l[s:e, None], w0h[s:e, None]))
            c1 = _sum_rows(*gl.mul(cols_l[s:e], cols_h[s:e],
                                   w1l[s:e, None], w1h[s:e, None]))
            s0 = c0 if s0 is None else gl.add(*s0, *c0)
            s1 = c1 if s1 is None else gl.add(*s1, *c1)
        diff = ge.sub((*s0, *s1), tuple(
            jnp.broadcast_to(v, s0[0].shape)
            for v in _ext_from_pair(scalar_sum)))
        return ge.mul(diff, inv_den)

    qg = g_pows[2 * W + 2 * A + K:]
    qw = _weights(qg)
    qc_scalar = ext_py.ZERO
    for gp, y in zip(qg, quotient_at_zeta):
        qc_scalar = ext_py.add(qc_scalar, ext_py.mul(gp, y))
    L_parts = [[], [], [], []]
    for c in range(blowup):
        xl_c, xh_c = coset_x(c)
        x_ext = (xl_c, xh_c, jnp.zeros_like(xl_c), jnp.zeros_like(xh_c))
        inv_x_zeta = ge.inv(ge.sub(x_ext, tuple(
            jnp.broadcast_to(v, xl_c.shape) for v in zeta_dev)))
        inv_x_wzeta = ge.inv(ge.sub(x_ext, tuple(
            jnp.broadcast_to(v, xl_c.shape) for v in wzeta_dev)))
        e_tr = _coset_evals(coeff_l, coeff_h, c, log_N)
        L = ge.zeros(xl_c.shape)
        L = ge.add(L, base_group_c(e_tr[0], e_tr[1], _weights(g_pows[:W]),
                                   dotc(g_pows[:W], trace_at_zeta),
                                   inv_x_zeta))
        L = ge.add(L, base_group_c(e_tr[0], e_tr[1],
                                   _weights(g_pows[W:2 * W]),
                                   dotc(g_pows[W:2 * W],
                                        trace_at_zeta_next), inv_x_wzeta))
        del e_tr
        if lookups or ports:
            e_ax = _coset_evals(*aux_coeff, c, log_N)
            ga = g_pows[2 * W:2 * W + A]
            gb = g_pows[2 * W + A:2 * W + 2 * A]
            L = ge.add(L, base_group_c(e_ax[0], e_ax[1], _weights(ga),
                                       dotc(ga, aux_at_zeta), inv_x_zeta))
            L = ge.add(L, base_group_c(e_ax[0], e_ax[1], _weights(gb),
                                       dotc(gb, aux_at_zeta_next),
                                       inv_x_wzeta))
            del e_ax
        if K:
            e_cl = _coset_evals(*const_coeff, c, log_N)
            kg = g_pows[2 * W + 2 * A:2 * W + 2 * A + K]
            L = ge.add(L, base_group_c(e_cl[0], e_cl[1], _weights(kg),
                                       dotc(kg, constants_at_zeta),
                                       inv_x_zeta))
            del e_cl
        e_q = _coset_evals(ql, qh, c, log_N)
        qc0l, qc0h = e_q[0][0::2], e_q[1][0::2]
        qc1l, qc1h = e_q[0][1::2], e_q[1][1::2]
        t00 = gl.mul(qc0l, qc0h, qw[0][:, None], qw[1][:, None])
        t11 = gl.mul(qc1l, qc1h, qw[2][:, None], qw[3][:, None])
        t01 = gl.mul(qc1l, qc1h, qw[0][:, None], qw[1][:, None])
        t10 = gl.mul(qc0l, qc0h, qw[2][:, None], qw[3][:, None])
        s_c0 = _sum_rows(*gl.add(*t00, *gl.mul_small(*t11, ge.W)))
        s_c1 = _sum_rows(*gl.add(*t01, *t10))
        qdiff = ge.sub((*s_c0, *s_c1), tuple(
            jnp.broadcast_to(v, s_c0[0].shape)
            for v in _ext_from_pair(qc_scalar)))
        L = ge.add(L, ge.mul(qdiff, inv_x_zeta))
        for i in range(4):
            L_parts[i].append(L[i])
    L = tuple(_interleave_cosets(p) for p in L_parts)

    # ---- FRI ---------------------------------------------------------------
    fri_proof, layers, codewords = fri_prove(L, log_N, gl.GENERATOR,
                                             config.fri, challenger)
    indices = derive_query_indices(challenger, log_N,
                                   config.fri.num_queries)
    fri_proof.query_rounds = [open_query(layers, codewords, i)
                              for i in indices]

    # ---- per-query openings: recompute only the queried cosets ------------
    by_coset: dict[int, list[int]] = {}
    for q in indices:
        by_coset.setdefault(q % blowup, []).append(q)
    leaf_at: dict[str, dict[int, list[int]]] = {
        "tr": {}, "q": {}, "k": {}, "ax": {}}
    groups = [("tr", (coeff_l, coeff_h)), ("q", (ql, qh))]
    if K:
        groups.append(("k", const_coeff))
    if lookups or ports:
        groups.append(("ax", aux_coeff))
    for c, js in by_coset.items():
        ts = np.array(sorted({j // blowup for j in js}), dtype=np.int64)
        t_pos = {int(t): k for k, t in enumerate(ts)}
        for name, (kl_, kh_) in groups:
            el, eh = _coset_evals(kl_, kh_, c, log_N)
            vals = np.asarray(gl.to_u64(el[:, ts], eh[:, ts]))
            for j in js:
                leaf_at[name][j] = [int(x) for x in
                                    vals[:, t_pos[j // blowup]]]
    trace_openings = []
    quotient_openings = []
    constants_openings = []
    aux_openings = []
    for q in indices:
        trace_openings.append(TreeOpening(leaf=leaf_at["tr"][q],
                                          path=trace_tree.open(q)))
        quotient_openings.append(TreeOpening(leaf=leaf_at["q"][q],
                                             path=quot_tree.open(q)))
        if K:
            constants_openings.append(TreeOpening(
                leaf=leaf_at["k"][q], path=const_tree.open(q)))
        if lookups or ports:
            aux_openings.append(TreeOpening(
                leaf=leaf_at["ax"][q], path=aux_tree.open(q)))

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
        aux_cap=aux_tree.cap_ints() if (lookups or ports) else [],
        aux_at_zeta=aux_at_zeta,
        aux_at_zeta_next=aux_at_zeta_next,
        aux_openings=aux_openings,
    )
