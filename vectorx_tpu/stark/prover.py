"""STARK prover: trace commit → constraint composition → quotient →
DEEP opening → FRI, each stage ONE device computation (stark/stages.py).

This is the TPU-native replacement for the reference stack's per-proof CPU
pipeline (plonky2 witness-gen → LDE → Merkle → FRI, SURVEY.md §3.1 "HOTTEST"
block).  Rounds 1-3 ran the same math eagerly — correct, but every `jnp` op
was a separate device dispatch, and on the remote-TPU tunnel a dispatch
costs ~28 ms (484 s for a 512-row proof, BENCH_r03).  Round 4 restructures
the prover around the staged library:

  trace commit     : iNTT → coset-LDE → leaf hash → Merkle layers (1 jit)
  aux commit       : LogUp/bus witness gen (1 jit) + the same commit stage
  composition      : one compiled graph per AIR SHAPE, challenges traced
  quotient         : Z_H division → iNTT → chunk split → re-NTT → Merkle
  DEEP evaluation  : every polynomial group at ζ and w·ζ, one dispatch
  DEEP composition : the batched opening codeword L(x), one dispatch
  FRI              : one fused fold + one commit dispatch per layer
  grind            : batched proof-of-work search on device
  openings         : every queried leaf + Merkle path in one bulk gather

A proof is a fixed ~30 device dispatches regardless of AIR width or
constraint count; stage callables are cached across proofs (keyed by graph
structure only — Fiat-Shamir values, publics, and witness data arrive as
traced arrays), so repeat proofs of a shape skip tracing and compilation
entirely.  The LDE matrices and Merkle layers never leave the device; only
caps, ζ-openings, and the final query gathers (a few KB) cross the tunnel.

The Fiat-Shamir transcript (tiny, sequential) stays on host and is identical
for the verifier — and across hosts in a multi-host proof.  All limb math is
exact field arithmetic, so the staged pipeline's proof bytes are
bit-identical to the eager rounds-1-3 pipeline (regression-locked by the
golden proofs in tests/).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from vectorx_tpu.field import ext_py
from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.fri.fri import (FriConfig, FriProof, FriQueryRound,
                                 FriQueryStep, derive_query_indices)
from vectorx_tpu.fri.transcript import Challenger
from vectorx_tpu.ntt.ntt import _root_of_unity
from vectorx_tpu.stark import stages
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


# Streamed-prover trigger: when the standing LDE matrices (trace + aux +
# constants + quotient chunks, each over the blown-up domain) would exceed
# this many limb elements (×8 bytes for the lo/hi uint32 pair), the prover
# switches to the coset-streamed schedule: every full-domain quantity is
# computed one stride-`blowup` coset at a time (1/blowup peak memory),
# commitments are built from interleaved per-coset leaf digests, and the
# proof bytes are BIT-IDENTICAL to the unstreamed path (regression-tested).
# 2^28 limb pairs ≈ 2 GB standing LDEs.  The staged prover holds every
# committed LDE until the bulk query-opening stage, so full-path peak runs
# ~4× standing (measured: a just-under-2^29 machine statement peaked at
# 16.13 G on a 15.75 G v5e) — 2^28 keeps peak ≈ 8 G with headroom.
STREAM_THRESHOLD_ELEMS = 1 << 28


def _commit_cols(air: Air) -> int:
    _, _, A = bus_aux_layout(air)
    return (air.width + A + air.num_constants()
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


def preprocess(air: Air, config: "StarkConfig", consts_u64=None):
    """Build the preprocessed-columns commitment (the AIR's "verification
    key").  Deterministic; prover and verifier both derive it.  Returns
    (tree or None, lde (lo, hi) or None, coeff (lo, hi) or None); the lde
    entry is None on the streamed path (callers recompute per coset)."""
    consts = air.constant_columns() if consts_u64 is None else consts_u64
    if consts.shape[0] == 0:
        return None, None, None
    cl, ch = gl.from_u64(consts)
    if _use_streaming(air, config):
        kl, kh = stages.to_coeffs(cl, ch)
        tree = stages.commit_streamed(kl, kh, air.log_n + config.rate_bits,
                                      config.fri.cap_height)
        return tree, None, (kl, kh)
    coeff, lde_, tree = stages.commit_rows(
        cl, ch, rate_bits=config.rate_bits, cap_height=config.fri.cap_height)
    return tree, lde_, coeff


def _num_quotient_chunks(air: Air) -> int:
    return max(air.constraint_degree, 2) - 1


def _ext_from_pair(pair):
    """Python (c0, c1) -> broadcastable device ext scalar."""
    from vectorx_tpu.field import extension as ge

    return ge.from_pair_u64(np.uint64(pair[0]), np.uint64(pair[1]))


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


# ---------------------------------------------------------------------------
# Lookup / bus auxiliary witness — ONE jitted device computation
# ---------------------------------------------------------------------------

def _aux_structure(air: Air):
    lk = tuple((l.table, tuple(l.inputs), l.multiplicity) for l in air.lookups())
    pt = tuple((p.addr_col, tuple(p.value_cols), p.mult_col)
               for p in air.bus_ports())
    return lk, pt


def aux_witness(air: Air, tl, th, cll, clh, betas, deltas):
    """Witness-generate ALL auxiliary columns — LogUp running sums Z_{l,s}
    then bus helpers h_{p,s} + running sums Z_s — as (A, n) device limb
    rows in ONE dispatch.

    Z_{l,s}[i] = Σ_{r<i} [ Σ_j 1/(β_s − a_j[r]) − m[r]/(β_s − t[r]) ];
    h_{p,s}·(β_s − addr − δ_s·v0' − δ_s²·v1') = m;  Z_s = running Σ_p h.

    One batched inverse covers every denominator; the running sums are
    log-depth device scans.  Challenges arrive as traced arrays and the
    constant columns as traced rows, so the compiled graph depends only on
    the lookup/bus STRUCTURE (column indices and counts)."""
    lookups = air.lookups()
    ports = air.bus_ports()
    S = NUM_LOOKUP_SETS
    key = ("aux", type(air).__qualname__, air.log_n, _aux_structure(air),
           stages.env_key())

    def build():
        def fn(tl, th, cll, clh, betas_pair, deltas_pair):
            betas_p = [(betas_pair[0][s], betas_pair[1][s])
                       for s in range(S)]
            deltas_p = [(deltas_pair[0][s], deltas_pair[1][s])
                        for s in range(S)] if ports else []
            dens_l, dens_h = [], []
            for port in ports:
                a_l, a_h = cll[port.addr_col], clh[port.addr_col]
                v0l = jnp.roll(tl[port.value_cols[0]], -1)
                v0h = jnp.roll(th[port.value_cols[0]], -1)
                v1l = jnp.roll(tl[port.value_cols[1]], -1)
                v1h = jnp.roll(th[port.value_cols[1]], -1)
                for (bl, bh), (dl, dh) in zip(betas_p, deltas_p):
                    d2l, d2h = gl.mul(dl, dh, dl, dh)
                    t1 = gl.mul(v0l, v0h, dl, dh)
                    t2 = gl.mul(v1l, v1h, d2l, d2h)
                    cmp_ = gl.add(*gl.add(a_l, a_h, *t1), *t2)
                    d = gl.sub(bl, bh, *cmp_)
                    dens_l.append(d[0])
                    dens_h.append(d[1])
            inv_l, inv_h = (gl.inv(jnp.stack(dens_l), jnp.stack(dens_h))
                            if dens_l else (None, None))
            rows_l, rows_h = [], []
            k = 0
            if lookups:
                # Vectorized by arity group: a thousand-lookup AIR (the
                # ed25519 ladder has 1066) must not emit a thousand-times
                # unrolled HLO graph — that OOM-killed the remote compile
                # helper.  Same math, same (lookup, set) row order, so aux
                # values and proof bytes are bit-identical to the unrolled
                # form.
                import numpy as np

                n = tl.shape[-1]
                Ln = len(lookups)
                lr_l = jnp.zeros((Ln, S, n), jnp.uint32)
                lr_h = jnp.zeros((Ln, S, n), jnp.uint32)
                by_ni: dict = {}
                for li, lk in enumerate(lookups):
                    by_ni.setdefault(len(lk.inputs), []).append(li)
                bl_s = betas_pair[0][:, None, None]    # (S, 1, 1)
                bh_s = betas_pair[1][:, None, None]
                for ni, idxs in sorted(by_ni.items()):
                    sel = np.array(idxs)
                    in_idx = np.array([lookups[li].inputs for li in idxs])
                    tb_idx = np.array([lookups[li].table for li in idxs])
                    mu_idx = np.array([lookups[li].multiplicity
                                       for li in idxs])
                    a_l, a_h = tl[in_idx], th[in_idx]          # (G, ni, n)
                    t_l, t_h = cll[tb_idx], clh[tb_idx]        # (G, n)
                    m_l, m_h = tl[mu_idx], th[mu_idx]          # (G, n)
                    # denominators (S, G, ni+1, n): β_s − inputs, β_s − table
                    cat_l = jnp.concatenate([a_l, t_l[:, None]], axis=1)
                    cat_h = jnp.concatenate([a_h, t_h[:, None]], axis=1)
                    d_l, d_h = gl.sub(bl_s[:, :, :, None], bh_s[:, :, :, None],
                                      cat_l[None], cat_h[None])
                    iv_l, iv_h = gl.inv(d_l, d_h)
                    c_l, c_h = iv_l[:, :, 0], iv_h[:, :, 0]    # (S, G, n)
                    for j in range(1, ni):
                        c_l, c_h = gl.add(c_l, c_h,
                                          iv_l[:, :, j], iv_h[:, :, j])
                    mt = gl.mul(m_l[None], m_h[None],
                                iv_l[:, :, ni], iv_h[:, :, ni])
                    c_l, c_h = gl.sub(c_l, c_h, *mt)
                    lr_l = lr_l.at[sel].set(jnp.moveaxis(c_l, 0, 1))
                    lr_h = lr_h.at[sel].set(jnp.moveaxis(c_h, 0, 1))
                zl, zh = _field_exclusive_prefix_sum(
                    lr_l.reshape(Ln * S, n), lr_h.reshape(Ln * S, n))
                for i in range(zl.shape[0]):
                    rows_l.append(zl[i])
                    rows_h.append(zh[i])
            if ports:
                hs = {}
                for p in range(len(ports)):
                    m_l, m_h = (cll[ports[p].mult_col], clh[ports[p].mult_col])
                    for s in range(S):
                        h = gl.mul(m_l, m_h, inv_l[k + p * S + s],
                                   inv_h[k + p * S + s])
                        hs[(p, s)] = h
                        rows_l.append(h[0])
                        rows_h.append(h[1])
                for s in range(S):
                    acc = hs[(0, s)]
                    for p in range(1, len(ports)):
                        acc = gl.add(*acc, *hs[(p, s)])
                    z = _field_exclusive_prefix_sum(acc[0][None, :],
                                                    acc[1][None, :])
                    rows_l.append(z[0][0])
                    rows_h.append(z[1][0])
            return jnp.stack(rows_l), jnp.stack(rows_h)

        return jax.jit(fn)

    return stages.cached_jit(key, build)(
        tl, th, cll, clh, _challenge_arrays(betas), _challenge_arrays(deltas))


# ---------------------------------------------------------------------------
# Constraint composition — one compiled graph per AIR SHAPE
# ---------------------------------------------------------------------------

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
    from vectorx_tpu.field import extension as ge

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
        # Memory-bounded boundary terms: a public-bind Blake2b batch pins
        # thousands of boundaries (16 × 2 KB headers = 8704), and (B, N)
        # intermediates at N = 2^16 are 2.1 GB EACH — the un-chunked form
        # OOMed a 16 GB v5e.  Denominators 1/(x − x_row) are inverted once
        # per UNIQUE row (boundaries cluster on message-start/digest rows),
        # and the boundary axis is chunked like the transition axis above.
        # Field sums reassociate exactly, so acc values (and proof bytes)
        # are identical to the flat form.
        w = _root_of_unity(air.log_n, inverse=False)
        rows = [row for (row, _c, _v) in boundaries]
        uniq = sorted(set(rows))
        uidx = {r: i for i, r in enumerate(uniq)}
        seg = np.array([uidx[r] for r in rows])
        cols = [c for (_r, c, _v) in boundaries]
        vl_, vh_ = bnd_v
        ap = tuple(t[n_trans:] for t in tw)

        CB = max(1, (1 << 25) // max(1, N))
        dinv_parts = []
        for s in range(0, len(uniq), CB):
            rows_x = np.array([pow(w, r, P) for r in uniq[s:s + CB]],
                              dtype=np.uint64)
            xrl, xrh = gl.from_u64(rows_x)
            dl, dh = gl.sub(xl[None, :], xh[None, :],
                            xrl[:, None], xrh[:, None])
            dinv_parts.append(gl.inv(dl, dh))
        dinv_l = jnp.concatenate([p[0] for p in dinv_parts], axis=0)
        dinv_h = jnp.concatenate([p[1] for p in dinv_parts], axis=0)

        b0 = b1 = None
        for s in range(0, n_bnd, CB):
            e = min(s + CB, n_bnd)
            # col index ≥ W addresses a lookup aux column (lookup_boundaries)
            pcl = jnp.stack([trl[c] if c < W else axl[c - W]
                             for c in cols[s:e]])
            pch = jnp.stack([trh[c] if c < W else axh[c - W]
                             for c in cols[s:e]])
            pl_, ph_ = gl.sub(pcl, pch, vl_[s:e, None], vh_[s:e, None])
            cl, ch = gl.mul(pl_, ph_, zh_l[None, :], zh_h[None, :])
            cl, ch = gl.mul(cl, ch, dinv_l[seg[s:e]], dinv_h[seg[s:e]])
            t0 = _sum_rows(*gl.mul(cl, ch, ap[0][s:e, None], ap[1][s:e, None]))
            t1 = _sum_rows(*gl.mul(cl, ch, ap[2][s:e, None], ap[3][s:e, None]))
            b0 = t0 if b0 is None else gl.add(*b0, *t0)
            b1 = t1 if b1 is None else gl.add(*b1, *t1)
        acc = ge.add(acc, (*b0, *b1))
    return acc


# Cross-instance composition-graph cache for AIRs that declare (via
# `Air.comp_cache_key`) that their transition reads statement data only
# through traced inputs.  Per-instance fallback lives on the air object.
_COMP_KEYED: dict = {}


def _structure_sig(air: Air, boundaries, K: int):
    return (type(air).__module__, type(air).__qualname__, air.log_n,
            air.width, air.constraint_degree, K,
            tuple((r, c) for (r, c, _v) in boundaries), _aux_structure(air))


def _composition_fn(air, config, public, boundaries, x_last, roll, K):
    """The composition callable for this AIR, cached so repeat proofs skip
    retracing AND recompilation.  AIRs whose `comp_cache_key()` returns a
    non-None extra share one graph across instances of the same shape
    (safe iff `transition` never reads `public` or per-statement instance
    arrays — statement data must flow through consts/boundary values,
    which are traced)."""
    extra = air.comp_cache_key()
    jit_on = _use_jit_constraints()
    kbase = (roll, config.rate_bits, jit_on, stages.env_key())
    if extra is None:
        cache = air.__dict__.setdefault("_comp_fns", {})
        key = kbase
    else:
        cache = _COMP_KEYED
        key = kbase + _structure_sig(air, boundaries, K) + (extra,)
    fn = cache.get(key)
    if fn is None:
        def body(trl, trh, axl, axh, cll, clh, alpha4, betas_pair,
                 deltas_pair, bnd_v, xl, xh, zh_l, zh_h):
            return _composition_core(air, public, boundaries, x_last, roll,
                                     trl, trh, axl, axh, cll, clh, alpha4,
                                     betas_pair, deltas_pair, bnd_v,
                                     xl, xh, zh_l, zh_h)

        fn = jax.jit(body) if jit_on else body
        cache[key] = fn
    return fn


# ---------------------------------------------------------------------------
# FRI prove — staged fold/commit, device-resident codewords
# ---------------------------------------------------------------------------

def _fri_prove_staged(L, log_len: int, shift: int, config: FriConfig,
                      challenger: Challenger, spill: bool = False):
    """Fold-and-commit layers on device.  Returns (FriProof without query
    rounds, layers) — query openings are gathered in bulk afterwards.

    spill=False: layers are [(codeword_device, DeviceTree)] for the bulk
    device gather (`stages.open_positions`).  spill=True (the streamed
    huge-proof path): each layer's codeword + tree are immediately moved
    to HOST numpy ([( (c0,c1) u64, HostTree )]) so the full ladder of FRI
    codewords/trees (~96 bytes/point summed over layers) never stands in
    HBM — the round-4 tree=16 flagship OOMed holding exactly this
    (16.13 G peak on a 15.75 G v5e).  Spilled values are the same
    canonical u64s the device gather would produce: proof bytes are
    BIT-IDENTICAL."""
    dev_layers = []
    caps = []
    c = L
    n = 1 << log_len
    cur_shift = shift
    cur_log = log_len
    while n > config.final_poly_len << config.rate_bits:
        tree = stages.fri_commit_layer(
            c, cur_log, min(config.cap_height, cur_log - 1))
        if spill:
            tree = stages.HostTree.from_device(tree)
        cap = tree.cap_ints()
        caps.append(cap)
        challenger.observe_cap(cap)
        beta = challenger.get_extension_challenge()
        c_next = stages.fri_fold(c, beta, cur_log, cur_shift)
        if spill:
            dev_layers.append((stages.spill_codeword(c), tree))
        else:
            dev_layers.append((c, tree))
        c = c_next
        cur_shift = (cur_shift * cur_shift) % P
        cur_log -= 1
        n >>= 1
    ok, final_coeffs = stages.fri_final_coeffs(c, cur_shift,
                                               config.final_poly_len)
    assert ok, "FRI input codeword exceeds the claimed degree bound"
    for (a, b) in final_coeffs:
        challenger.observe(a)
        challenger.observe(b)
    pow_witness = stages.grind(challenger, config.pow_bits)
    proof = FriProof(caps=caps, final_coeffs=final_coeffs,
                     pow_witness=pow_witness)
    return proof, dev_layers


# ---------------------------------------------------------------------------
# Opening assembly (host lists from the bulk gather)
# ---------------------------------------------------------------------------

def _tree_openings(leaves_u64, path_levels, n_queries: int):
    """(R, Q) leaves + per-level (Q, 4) siblings -> [TreeOpening]."""
    return [TreeOpening(
        leaf=[int(x) for x in leaves_u64[:, qi]],
        path=[[int(x) for x in lvl[qi]] for lvl in path_levels])
        for qi in range(n_queries)]


def _fri_rounds(fri_pairs, fri_paths, n_queries: int):
    rounds = []
    for qi in range(n_queries):
        steps = []
        for (pr, sibs) in zip(fri_pairs, fri_paths):
            pair = [int(pr[0][qi]), int(pr[1][qi]),
                    int(pr[2][qi]), int(pr[3][qi])]
            path = [[int(x) for x in lvl[qi]] for lvl in sibs]
            steps.append(FriQueryStep(pair=pair, path=path))
        rounds.append(FriQueryRound(steps=steps))
    return rounds


# ---------------------------------------------------------------------------
# prove
# ---------------------------------------------------------------------------

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
    rate = config.rate_bits
    challenger = Challenger()
    public = air.public_inputs()
    challenger.observe_many(public)

    # ---- preprocessed (constant) columns ---------------------------------
    consts_u64 = air.constant_columns()
    K = consts_u64.shape[0]
    const_tree, const_lde, const_coeff = preprocess(air, config, consts_u64)
    if const_tree is not None and const_lde is None:
        # preprocess streamed its commitment (huge AIR, host-spilled tree)
        # but this path was forced (e.g. trace_sharding): rebuild the full
        # device commitment so the bulk device gather below can open it
        # (bit-identical tree — regression-locked streamed/unstreamed)
        _, const_lde, const_tree2 = stages.commit_rows(
            *const_coeff, rate_bits=rate, cap_height=cap_h, do_intt=False)
        assert const_tree2.cap_ints() == const_tree.cap_ints()
        const_tree = const_tree2
    if const_tree is not None:
        challenger.observe_cap(const_tree.cap_ints())

    # ---- trace commit -----------------------------------------------------
    tl, th = gl.from_u64(trace_u64)                  # (W, n)
    if trace_sharding is not None:
        tl = jax.device_put(tl, trace_sharding)
        th = jax.device_put(th, trace_sharding)
    (coeff_l, coeff_h), (tr_lde_l, tr_lde_h), trace_tree = \
        stages.commit_rows(tl, th, rate_bits=rate, cap_height=cap_h)
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
        ccl, cch = gl.from_u64(consts_u64)
        axl, axh = aux_witness(air, tl, th, ccl, cch, betas, deltas)
        aux_coeff, aux_lde, aux_tree = stages.commit_rows(
            axl, axh, rate_bits=rate, cap_height=cap_h)
        challenger.observe_cap(aux_tree.cap_ints())

    # ---- constraint composition ------------------------------------------
    alpha = challenger.get_extension_challenge()
    xl, xh = stages.domain_x(log_N, gl.GENERATOR)
    zh_l, zh_h, zhinv_l, zhinv_h = stages.zh_on_domain(air.log_n, rate)
    w = _root_of_unity(air.log_n, inverse=False)
    x_last = pow(w, n - 1, P)
    boundaries = list(air.boundaries(public)) + \
        (lookup_boundaries(air) if (lookups or ports) else [])

    empty = (jnp.zeros((0, N), jnp.uint32), jnp.zeros((0, N), jnp.uint32))
    comp = _composition_fn(air, config, public, boundaries, x_last,
                           roll=blowup, K=K)
    acc = comp(tr_lde_l, tr_lde_h,
               aux_lde[0] if aux_lde else empty[0],
               aux_lde[1] if aux_lde else empty[1],
               const_lde[0] if K else empty[0],
               const_lde[1] if K else empty[1],
               _ext_from_pair(alpha),
               _challenge_arrays(betas), _challenge_arrays(deltas),
               _boundary_value_arrays(boundaries),
               xl, xh, zh_l, zh_h)

    # ---- quotient ---------------------------------------------------------
    chunks = _num_quotient_chunks(air)
    ok, (ql, qh) = stages.quotient_coeffs(acc, (zhinv_l, zhinv_h),
                                          chunks, rate)
    del acc
    assert bool(ok), \
        "composition polynomial exceeds quotient degree bound (AIR misconfigured?)"
    _, (q_lde_l, q_lde_h), quot_tree = stages.commit_rows(
        ql, qh, rate_bits=rate, cap_height=cap_h, do_intt=False)
    challenger.observe_cap(quot_tree.cap_ints())

    # ---- DEEP openings (all groups at ζ and w·ζ, one dispatch) ------------
    zeta = challenger.get_extension_challenge()
    w_zeta = ext_py.mul(zeta, ext_py.from_base(w))
    groups = [(coeff_l, coeff_h)]
    if aux_coeff is not None:
        groups.append(aux_coeff)
    if K:
        groups.append(const_coeff)
    groups.append((ql, qh))
    evals = stages.deep_eval_groups(groups, zeta, w_zeta, air.log_n)
    gi = 1
    trace_at_zeta, trace_at_zeta_next = evals[0]
    aux_at_zeta: list = []
    aux_at_zeta_next: list = []
    if aux_coeff is not None:
        aux_at_zeta, aux_at_zeta_next = evals[gi]
        gi += 1
    constants_at_zeta: list = []
    if K:
        constants_at_zeta = evals[gi][0]
        gi += 1
    quot_at_zeta_flat = evals[gi][0]
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

    # ---- DEEP composition codeword (one dispatch) -------------------------
    gamma = challenger.get_extension_challenge()
    ldes = ((tr_lde_l, tr_lde_h),
            aux_lde if A else None,
            const_lde if K else None,
            (q_lde_l, q_lde_h))
    opened = (trace_at_zeta, trace_at_zeta_next, aux_at_zeta,
              aux_at_zeta_next, constants_at_zeta, quotient_at_zeta)
    L = stages.deep_compose(ldes, opened, gamma, zeta, w_zeta,
                            W, A, K, chunks, log_N)

    # ---- FRI --------------------------------------------------------------
    fri_proof, fri_dev = _fri_prove_staged(L, log_N, gl.GENERATOR,
                                           config.fri, challenger)
    indices = derive_query_indices(challenger, log_N,
                                   config.fri.num_queries)

    # ---- bulk query openings ---------------------------------------------
    leaf_groups = [(tr_lde_l, tr_lde_h), (q_lde_l, q_lde_h)]
    trees = [trace_tree, quot_tree]
    if K:
        leaf_groups.append(const_lde)
        trees.append(const_tree)
    if A:
        leaf_groups.append(aux_lde)
        trees.append(aux_tree)
    g_leaves, g_paths, fri_pairs, fri_paths = stages.open_positions(
        indices, leaf_groups, trees, fri_dev)
    Q = len(indices)
    trace_openings = _tree_openings(g_leaves[0], g_paths[0], Q)
    quotient_openings = _tree_openings(g_leaves[1], g_paths[1], Q)
    gi = 2
    constants_openings: list = []
    if K:
        constants_openings = _tree_openings(g_leaves[gi], g_paths[gi], Q)
        gi += 1
    aux_openings: list = []
    if A:
        aux_openings = _tree_openings(g_leaves[gi], g_paths[gi], Q)
    fri_proof.query_rounds = _fri_rounds(fri_pairs, fri_paths, Q)

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


# ---------------------------------------------------------------------------
# Coset-streamed prove (1/blowup peak memory, bit-identical proofs)
# ---------------------------------------------------------------------------

def _interleave_cosets(parts):
    """[(n,) per coset c=0..blowup-1] -> (N,) in LDE natural order."""
    return jnp.stack(parts, axis=-1).reshape(-1)


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
    from vectorx_tpu.field import extension as ge

    n = air.n
    W = air.width
    assert trace_u64.shape == (W, n)
    blowup = 1 << config.rate_bits
    log_N = air.log_n + config.rate_bits
    cap_h = config.fri.cap_height
    rate = config.rate_bits
    challenger = Challenger()
    public = air.public_inputs()
    challenger.observe_many(public)

    # ---- preprocessed (constant) columns ----------------------------------
    consts_u64 = air.constant_columns()
    K = consts_u64.shape[0]
    const_tree, _, const_coeff = preprocess(air, config, consts_u64)
    if const_tree is not None:
        challenger.observe_cap(const_tree.cap_ints())

    # ---- trace commit ------------------------------------------------------
    tl, th = gl.from_u64(trace_u64)
    coeff_l, coeff_h = stages.to_coeffs(tl, th)
    trace_tree = stages.commit_streamed(coeff_l, coeff_h, log_N, cap_h)
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
        ccl, cch = gl.from_u64(consts_u64)
        axl, axh = aux_witness(air, tl, th, ccl, cch, betas, deltas)
        del ccl, cch
        aux_coeff = stages.to_coeffs(axl, axh)
        del axl, axh
        aux_tree = stages.commit_streamed(aux_coeff[0], aux_coeff[1],
                                          log_N, cap_h)
        challenger.observe_cap(aux_tree.cap_ints())
    # evaluation-form trace rows are no longer needed: everything
    # downstream reads the coefficient groups (frees (W, n) limb pairs)
    del tl, th

    # ---- constraint composition, coset by coset ---------------------------
    alpha = challenger.get_extension_challenge()
    w = _root_of_unity(air.log_n, inverse=False)
    x_last = pow(w, n - 1, P)
    boundaries = list(air.boundaries(public)) + \
        (lookup_boundaries(air) if (lookups or ports) else [])
    zh_vals, _zh_invs = stages.zh_values(air.log_n, rate)
    comp = _composition_fn(air, config, public, boundaries, x_last,
                           roll=1, K=K)
    wt_l, wt_h = stages.shift_table(w, n)    # w_n^t table, all cosets
    empty = (jnp.zeros((0, n), jnp.uint32), jnp.zeros((0, n), jnp.uint32))
    alpha4 = _ext_from_pair(alpha)
    betas_pair = _challenge_arrays(betas)
    deltas_pair = _challenge_arrays(deltas)
    bnd_v = _boundary_value_arrays(boundaries)

    def coset_x(c):
        s = stages.coset_shift(c, log_N)
        return gl.mul(wt_l, wt_h, jnp.uint32(s & 0xFFFFFFFF),
                      jnp.uint32(s >> 32))

    def scalar_fill(v):
        return (jnp.full((n,), v & 0xFFFFFFFF, jnp.uint32),
                jnp.full((n,), v >> 32, jnp.uint32))

    def coset_evals(coeff, c):
        return stages.coset_eval_rows(coeff[0], coeff[1],
                                      stages.coset_shift(c, log_N))

    acc_parts = [[], [], [], []]
    for c in range(blowup):
        e_tr = coset_evals((coeff_l, coeff_h), c)
        e_ax = coset_evals(aux_coeff, c) if aux_coeff else empty
        e_cl = coset_evals(const_coeff, c) if K else empty
        xl_c, xh_c = coset_x(c)
        zh_c = scalar_fill(zh_vals[c])
        acc_c = comp(e_tr[0], e_tr[1], e_ax[0], e_ax[1], e_cl[0], e_cl[1],
                     alpha4, betas_pair, deltas_pair, bnd_v,
                     xl_c, xh_c, zh_c[0], zh_c[1])
        for i in range(4):
            acc_parts[i].append(acc_c[i])
    acc = tuple(_interleave_cosets(p) for p in acc_parts)

    # ---- quotient ----------------------------------------------------------
    _, _, zhinv_l, zhinv_h = stages.zh_on_domain(air.log_n, rate)
    chunks = _num_quotient_chunks(air)
    ok, (ql, qh) = stages.quotient_coeffs(acc, (zhinv_l, zhinv_h),
                                          chunks, rate)
    del acc
    assert bool(ok), "composition polynomial exceeds quotient degree bound"
    quot_tree = stages.commit_streamed(ql, qh, log_N, cap_h)
    challenger.observe_cap(quot_tree.cap_ints())

    # ---- DEEP openings at ζ (coefficient-side, identical to `prove`) ------
    zeta = challenger.get_extension_challenge()
    w_zeta = ext_py.mul(zeta, ext_py.from_base(w))
    groups = [(coeff_l, coeff_h)]
    if aux_coeff is not None:
        groups.append(aux_coeff)
    if K:
        groups.append(const_coeff)
    groups.append((ql, qh))
    evals = stages.deep_eval_groups(groups, zeta, w_zeta, air.log_n)
    gi = 1
    trace_at_zeta, trace_at_zeta_next = evals[0]
    aux_at_zeta: list = []
    aux_at_zeta_next: list = []
    if aux_coeff is not None:
        aux_at_zeta, aux_at_zeta_next = evals[gi]
        gi += 1
    constants_at_zeta: list = []
    if K:
        constants_at_zeta = evals[gi][0]
        gi += 1
    quot_at_zeta_flat = evals[gi][0]
    quotient_at_zeta = []
    for k in range(chunks):
        e0 = quot_at_zeta_flat[2 * k]
        e1 = quot_at_zeta_flat[2 * k + 1]
        quotient_at_zeta.append(ext_py.add(e0, ext_py.mul((0, 1), e1)))
    for pair in (*trace_at_zeta, *trace_at_zeta_next, *aux_at_zeta,
                 *aux_at_zeta_next, *constants_at_zeta, *quotient_at_zeta):
        challenger.observe(pair[0])
        challenger.observe(pair[1])

    # ---- DEEP composition codeword, coset by coset ------------------------
    gamma = challenger.get_extension_challenge()
    coeff_groups = ((coeff_l, coeff_h),
                    aux_coeff if A else None,
                    const_coeff if K else None,
                    (ql, qh))
    opened = (trace_at_zeta, trace_at_zeta_next, aux_at_zeta,
              aux_at_zeta_next, constants_at_zeta, quotient_at_zeta)
    L_parts = [[], [], [], []]
    for c in range(blowup):
        L_c = stages.deep_compose_coset(coeff_groups, opened, gamma, zeta,
                                        w_zeta, W, A, K, chunks, log_N, c)
        for i in range(4):
            L_parts[i].append(L_c[i])
    L = tuple(_interleave_cosets(p) for p in L_parts)

    # ---- FRI (codewords + trees host-spilled as folding proceeds) ---------
    fri_proof, fri_host = _fri_prove_staged(L, log_N, gl.GENERATOR,
                                            config.fri, challenger,
                                            spill=True)
    del L
    indices = derive_query_indices(challenger, log_N,
                                   config.fri.num_queries)

    # ---- per-query openings: recompute only the queried cosets ------------
    by_coset: dict[int, list[int]] = {}
    for q in indices:
        by_coset.setdefault(q % blowup, []).append(q)
    leaf_at: dict[str, dict[int, list[int]]] = {
        "tr": {}, "q": {}, "k": {}, "ax": {}}
    named = [("tr", (coeff_l, coeff_h)), ("q", (ql, qh))]
    if K:
        named.append(("k", const_coeff))
    if aux_coeff is not None:
        named.append(("ax", aux_coeff))
    for c, js in by_coset.items():
        ts = np.array(sorted({j // blowup for j in js}), dtype=np.int64)
        t_pos = {int(t): k for k, t in enumerate(ts)}
        for name, grp in named:
            el, eh = coset_evals(grp, c)
            vals = np.asarray(gl.to_u64(el[:, ts], eh[:, ts]))
            for j in js:
                leaf_at[name][j] = [int(x) for x in
                                    vals[:, t_pos[j // blowup]]]
    trees = [trace_tree, quot_tree]
    if K:
        trees.append(const_tree)
    if aux_coeff is not None:
        trees.append(aux_tree)
    # every tree + FRI layer lives on host now: paths/pairs gather in numpy
    g_paths, fri_pairs, fri_paths = stages.open_positions_host(
        indices, trees, fri_host)
    Q = len(indices)

    def openings(name, paths):
        return [TreeOpening(leaf=leaf_at[name][q],
                            path=[[int(x) for x in lvl[qi]]
                                  for lvl in paths])
                for qi, q in enumerate(indices)]

    trace_openings = openings("tr", g_paths[0])
    quotient_openings = openings("q", g_paths[1])
    gi = 2
    constants_openings: list = []
    if K:
        constants_openings = openings("k", g_paths[gi])
        gi += 1
    aux_openings: list = []
    if aux_coeff is not None:
        aux_openings = openings("ax", g_paths[gi])
    fri_proof.query_rounds = _fri_rounds(fri_pairs, fri_paths, Q)

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
