"""Single-pass in-VMEM Goldilocks NTT as a Pallas TPU kernel.

The XLA radix-2 path (`ntt._transform`) materializes the working array in
HBM once per butterfly stage: a size-2^k transform costs ~2k full HBM
passes, which caps it near 1/(2k) of the HBM-bandwidth bound.  This kernel
instead loads each length-n row into VMEM ONCE, runs every butterfly stage
on-chip, and writes the result ONCE — the four-step (Bailey) decomposition
n = R·C mapped onto the VPU's (sublane, lane) geometry:

    x (R, C), M[r][c] = x[r·C + c],   k = k1 + R·k2
      1. DIF NTT of length R down the SUBLANE axis (lanes = c, vectorized)
      2. elementwise twiddle  ω_n^(k1·c)
      3. DIF NTT of length C along the LANE axis
      4. store  O[p][q] = X[br_R(p) + R·br_C(q)]

Both inner transforms are decimation-in-frequency with the butterfly in
XOR form — partner(i) = i XOR h via two circular rolls and a select — so
the kernel needs NO in-VMEM bit-reversal, NO transpose, and NO gather:
only `pltpu.roll`, selects, and the uint32 limb field ops from
`vectorx_tpu.field.goldilocks` (written to trace inside Pallas bodies).
The single digit-reversal permutation left over is applied OUTSIDE the
kernel by one XLA gather (`jnp.take`), which XLA fuses with neighbouring
elementwise work.  Net HBM traffic: ~2 passes (+1 for the gather) versus
~2·log2(n) for the stage-by-stage path.

Replaces the hot polynomial transform of the reference proving stack
(plonky2 `fft`/`coset_lde` — SURVEY.md §2 E1).  Dispatch: `ntt._transform`
routes here on real TPU for supported sizes ONLY when the
VECTORX_PALLAS_NTT gate allows it (see `ntt._use_pallas` for the current
default); `transform_any` below is the direct, ungated entry point.
On-chip bit-exactness + timing evidence: evidence/drive_pallas_ntt.py →
evidence/pallas_ntt.json.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vectorx_tpu.field import goldilocks as gl

P = gl.P

MIN_LOG_N = 10   # below this R < 8 sublanes: XLA path is fine anyway
MAX_LOG_N = 18   # above this the (R, C) working set outgrows VMEM


def supported(log_n: int) -> bool:
    """Sizes the Pallas path covers: VMEM-resident single-kernel sizes,
    plus big sizes four-stepped at the XLA level into two kernel passes
    (both halves must themselves be kernel sizes, so 2^19 is excluded)."""
    if MIN_LOG_N <= log_n <= MAX_LOG_N:
        return True
    hi_half = (log_n + 1) // 2
    return (MAX_LOG_N < log_n <= 2 * MIN_LOG_N + 4
            and log_n - hi_half >= MIN_LOG_N)


def _split_rc(log_n: int) -> tuple[int, int]:
    """n = R·C with C the lane dimension (128 or 256 at real sizes; tiny
    log_n only occurs in interpret-mode tests, where tiling is moot)."""
    c_bits = 8 if log_n >= 16 else 7 if log_n >= MIN_LOG_N else (log_n + 1) // 2
    return 1 << (log_n - c_bits), 1 << c_bits


def _bitrev(k_bits: int) -> np.ndarray:
    n = 1 << k_bits
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(k_bits):
        rev |= ((idx >> b) & 1) << (k_bits - 1 - b)
    return rev


def _np_limbs(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    v = vals.astype(np.uint64)
    return ((v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (v >> np.uint64(32)).astype(np.uint32))


def _np_powmod(base: np.ndarray, exp: np.ndarray) -> np.ndarray:
    """Elementwise base^exp mod P on uint64 numpy arrays (object-free).

    Square-and-multiply with the product done in Python ints only at the
    table-build sizes used here (≤ 2^18 entries, built once per shape and
    lru-cached) — numpy has no native 64×64→128 modmul.
    """
    flat_b = base.ravel().tolist()
    flat_e = exp.ravel().tolist()
    out = [pow(int(b), int(e), P) for b, e in zip(flat_b, flat_e)]
    return np.array(out, dtype=np.uint64).reshape(base.shape)


def _stage_twiddles(w_l: int, length: int) -> np.ndarray:
    """DIF stage twiddles for a length-`length` transform with root w_l.

    Stage t (t = 0..log2-1, half-size h = length >> (t+1)) multiplies the
    odd output by w_l^((i mod h) << t); the table holds that value at every
    absolute position i (even positions are never selected).  Shape
    (length, n_stages) so an in-kernel [:, t:t+1] slice is already a
    sublane column / [t:t+1, :] a lane row without any relayout.
    """
    k = length.bit_length() - 1
    pows = np.array(_pow_list(w_l, max(length // 2, 1)), dtype=np.uint64)
    tbl = np.empty((k, length), dtype=np.uint64)
    idx = np.arange(length)
    for t in range(k):
        h = length >> (t + 1)
        tbl[t] = pows[(idx & (h - 1)) << t]
    return tbl


@functools.lru_cache(maxsize=None)
def _pow_list(base: int, count: int) -> tuple:
    out = [1] * count
    cur = 1
    for i in range(1, count):
        cur = (cur * base) % P
        out[i] = cur
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _tables(log_n: int, inverse: bool):
    """All host-side constant tables for the (log_n, inverse) transform."""
    from vectorx_tpu.ntt.ntt import _root_of_unity

    n = 1 << log_n
    R, C = _split_rc(log_n)
    w_n = _root_of_unity(log_n, inverse)
    w_r = pow(w_n, C, P)
    w_c = pow(w_n, R, P)

    br_r = _bitrev(R.bit_length() - 1)
    br_c = _bitrev(C.bit_length() - 1)

    # inner stage twiddles, transposed to (R, kR): column slices are free
    twi = _stage_twiddles(w_r, R).T.copy()
    # outer stage twiddles, (kC, C): row slices are free
    two = _stage_twiddles(w_c, C)
    # mid twiddle at its stored position: W1[p][c] = w_n^(br_R(p)·c)
    exps = np.outer(br_r, np.arange(C, dtype=np.int64))
    w1 = _np_powmod(np.full((R, C), w_n, dtype=np.uint64),
                    exps.astype(np.uint64))
    # output digit-reversal: natural k = k1 + R·k2 lives at flat position
    # br_R(k1)·C + br_C(k2) of the kernel output
    k1 = np.arange(n) % R
    k2 = np.arange(n) // R
    perm = (br_r[k1] * C + br_c[k2]).astype(np.int32)

    return (R, C, _np_limbs(twi), _np_limbs(two), _np_limbs(w1), perm)


def _kernel(G: int, R: int, C: int, xl_ref, xh_ref, til_ref, tih_ref,
            w1l_ref, w1h_ref, tol_ref, toh_ref, ol_ref, oh_ref):
    xl = xl_ref[:]
    xh = xh_ref[:]
    row = jax.lax.broadcasted_iota(jnp.uint32, (G, R, C), 1)
    col = jax.lax.broadcasted_iota(jnp.uint32, (G, R, C), 2)

    def dif_stage(xl, xh, idx, length, axis, t, twl, twh):
        h = length >> (t + 1)
        bit = (idx >> np.uint32(length.bit_length() - 2 - t)) & np.uint32(1)
        odd = bit == np.uint32(1)
        # partner(i) = i XOR h, via two circular rolls + select
        dl = pltpu.roll(xl, h, axis=axis)
        dh = pltpu.roll(xh, h, axis=axis)
        ul = pltpu.roll(xl, length - h, axis=axis)
        uh = pltpu.roll(xh, length - h, axis=axis)
        pl_ = jnp.where(odd, dl, ul)
        ph_ = jnp.where(odd, dh, uh)
        sl, sh = gl.add(xl, xh, pl_, ph_)        # even: a + b
        el, eh = gl.sub(pl_, ph_, xl, xh)        # odd:  a - b
        ml, mh = gl.mul(el, eh, twl, twh)        # odd:  (a - b)·tw
        return jnp.where(odd, ml, sl), jnp.where(odd, mh, sh)

    for t in range(R.bit_length() - 1):          # inner: down sublanes
        xl, xh = dif_stage(xl, xh, row, R, 1, t,
                           til_ref[:, t:t + 1], tih_ref[:, t:t + 1])
    xl, xh = gl.mul(xl, xh, w1l_ref[:], w1h_ref[:])
    for t in range(C.bit_length() - 1):          # outer: along lanes
        xl, xh = dif_stage(xl, xh, col, C, 2, t,
                           tol_ref[t:t + 1, :], toh_ref[t:t + 1, :])
    ol_ref[:] = xl
    oh_ref[:] = xh


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def transform(lo, hi, log_n: int, inverse: bool, interpret: bool = False):
    """Same contract as ntt._transform: natural-order coefficients ->
    natural-order evaluations over the size-n two-adic subgroup (and the
    exact inverse map with inverse=True), batched over leading axes."""
    n = 1 << log_n
    assert lo.shape[-1] == n
    R, C, (til, tih), (tol, toh), (w1l, w1h), perm = _tables(log_n, inverse)
    batch = lo.shape[:-1]
    b = 1
    for d in batch:
        b *= d
    # rows per kernel block: amortize grid/pipeline overhead for short
    # transforms while keeping the working set (in+out, 2 limbs each)
    # comfortably inside VMEM (~2^19 elements ≙ 8 MB total)
    g = max(1, min(b, (1 << 19) // n))
    bp = -(-b // g) * g                      # pad rows to a multiple of g
    xl = lo.reshape(b, n)
    xh = hi.reshape(b, n)
    if bp != b:
        xl = jnp.pad(xl, ((0, bp - b), (0, 0)))
        xh = jnp.pad(xh, ((0, bp - b), (0, 0)))
    xl = xl.reshape(bp, R, C)
    xh = xh.reshape(bp, R, C)

    full = lambda shape: pl.BlockSpec(  # noqa: E731 — local spec helper
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((g, R, C), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    # the unrolled butterfly ladder keeps ~12 block-sized temporaries live
    # per stage, which blows Mosaic's default 16 MB *scoped* vmem budget
    # on real silicon (seen: 27.6 MB wanted at g·n = 2^19 — BENCH r5 run).
    # v5e has 128 MB physical VMEM per core: raise the scoped budget to
    # 96 MB and let the pipeline use it instead of shrinking the block.
    ol, oh = pl.pallas_call(
        functools.partial(_kernel, g, R, C),
        grid=(bp // g,),
        in_specs=[blk, blk, full(til.shape), full(tih.shape),
                  full(w1l.shape), full(w1h.shape),
                  full(tol.shape), full(toh.shape)],
        out_specs=[blk, blk],
        out_shape=[jax.ShapeDtypeStruct((bp, R, C), jnp.uint32)] * 2,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(xl, xh, jnp.asarray(til), jnp.asarray(tih), jnp.asarray(w1l),
      jnp.asarray(w1h), jnp.asarray(tol), jnp.asarray(toh))

    ol = jnp.take(ol.reshape(bp, n)[:b], jnp.asarray(perm), axis=-1)
    oh = jnp.take(oh.reshape(bp, n)[:b], jnp.asarray(perm), axis=-1)
    if inverse:
        n_inv = pow(n, P - 2, P)
        ol, oh = gl.mul(ol, oh, jnp.uint32(n_inv & 0xFFFFFFFF),
                        jnp.uint32(n_inv >> 32))
    return ol.reshape(*batch, n), oh.reshape(*batch, n)


def _dev_twiddle_grid(w_n: int, rows: int, cols: int):
    """Device-built (rows, cols) table w_n^(r·c), literal-free.

    Row r is the power series of w_n^r; built by column-doubling
    (T[:, :2k] = T[:, :k] ++ T[:, :k]·base^k) so the trace holds only
    O(log cols) ops over full-width arrays — the same discipline as
    ntt._dev_powers, which keeps multi-MB tables out of the lowered HLO."""
    from vectorx_tpu.ntt.ntt import _dev_powers

    bl, bh = _dev_powers(w_n, rows)                    # base[r] = w_n^r
    bl, bh = bl[:, None], bh[:, None]
    tl = jnp.ones((rows, 1), jnp.uint32)
    th = jnp.zeros((rows, 1), jnp.uint32)
    k = 1
    while k < cols:
        sl, sh = gl.mul(tl, th, bl, bh)                # T[:, :k] · base^k
        tl = jnp.concatenate([tl, sl], axis=1)
        th = jnp.concatenate([th, sh], axis=1)
        bl, bh = gl.sqr(bl, bh)                        # base^k -> base^2k
        k *= 2
    return tl[:, :cols], th[:, :cols]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def transform_big(lo, hi, log_n: int, inverse: bool, interpret: bool = False):
    """Four-step NTT at the XLA level for sizes past VMEM residency:
    n = N1·N2 with both halves kernel sizes.  Two Pallas passes + one
    twiddle pass + transposes, ~13 HBM passes total versus ~2·log2(n)
    for the stage-by-stage path."""
    from vectorx_tpu.ntt.ntt import _root_of_unity

    n = 1 << log_n
    assert lo.shape[-1] == n
    log_r = log_n - (log_n + 1) // 2     # inner length (R), the short half
    log_c = log_n - log_r                # outer length (C)
    R, C = 1 << log_r, 1 << log_c
    batch = lo.shape[:-1]
    b = 1
    for d in batch:
        b *= d
    # x[j], j = c + C·r  ->  M[b][r][c]; inner NTT is over r for each c
    xl = lo.reshape(b, R, C).swapaxes(-1, -2)          # (b, C, R)
    xh = hi.reshape(b, R, C).swapaxes(-1, -2)
    xl, xh = transform(xl, xh, log_r, inverse, interpret)
    w_n = _root_of_unity(log_n, inverse)
    twl, twh = _dev_twiddle_grid(w_n, C, R)            # tw[c][k1] = w^(c·k1)
    xl, xh = gl.mul(xl, xh, twl, twh)
    xl = xl.swapaxes(-1, -2)                           # (b, R=k1, C=c)
    xh = xh.swapaxes(-1, -2)
    xl, xh = transform(xl, xh, log_c, inverse, interpret)
    # V[k1][k2]: natural index k = k1 + R·k2  ->  transpose then flatten
    ol = xl.swapaxes(-1, -2).reshape(*batch, n)
    oh = xh.swapaxes(-1, -2).reshape(*batch, n)
    return ol, oh


def transform_any(lo, hi, log_n: int, inverse: bool,
                  interpret: bool = False):
    """Dispatch to the single-kernel or four-stepped path by size."""
    if log_n <= MAX_LOG_N:
        return transform(lo, hi, log_n, inverse, interpret)
    return transform_big(lo, hi, log_n, inverse, interpret)
