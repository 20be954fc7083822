"""Radix-2 NTT / iNTT / coset-LDE over Goldilocks, batched along leading axes.

TPU-native equivalent of the reference proving stack's CPU polynomial
pipeline (plonky2 `fft`/`coset_lde`, used for witness + quotient polynomials —
SURVEY.md §2 E1).  Everything is fixed-shape uint32 limb math from
`vectorx_tpu.field.goldilocks`; a transform over (..., n) runs log2(n)
vectorized butterfly stages, each an element-wise VPU pass, so XLA fuses the
limb arithmetic within a stage.

Conventions:
* `ntt` maps coefficients -> evaluations over the two-adic subgroup of size n
  in natural order (w^0, w^1, ..).  `intt` is its inverse.
* `coset_lde` evaluates on the coset g·K of the blown-up subgroup K
  (|K| = n << rate_bits), g = GENERATOR = 7 — the same rate-8 / shift-g
  layout plonky2 uses for its LDE (rate 2^3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from vectorx_tpu.field import goldilocks as gl

P = gl.P


def _root_of_unity(log_n: int, inverse: bool) -> int:
    assert log_n <= gl.TWO_ADICITY
    w = pow(gl.POWER_OF_TWO_GENERATOR, 1 << (gl.TWO_ADICITY - log_n), P)
    if inverse:
        w = pow(w, P - 2, P)
    return w


@functools.lru_cache(maxsize=None)
def power_table(base: int, count: int):
    """[base^0, .., base^(count-1)] as (lo, hi) uint32 numpy arrays.

    Built host-side by repeated doubling (log2(count) vectorized modmuls done
    in Python ints via numpy object arrays would be slow; instead use plain
    Python running products only for the log-many block seeds).
    """
    vals = np.empty(count, dtype=np.uint64)
    if count == 0:
        return vals.astype(np.uint32), vals.astype(np.uint32)
    # doubling: P_{2k} = P_k ++ (P_k * base^k)
    out = [1]
    cur_pow = base % P  # base^(len(out)) at each step
    py = [1]
    while len(py) < count:
        mult = cur_pow
        py = py + [(x * mult) % P for x in py]
        cur_pow = (cur_pow * cur_pow) % P
    vals = np.array(py[:count], dtype=np.uint64)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    return lo, hi


@functools.lru_cache(maxsize=None)
def _twiddles(log_n: int, inverse: bool):
    """Full table [w^0 .. w^(n/2 - 1)] for the size-n transform.
    numpy (not device) arrays: safe to cache across jit traces."""
    n = 1 << log_n
    w = _root_of_unity(log_n, inverse)
    lo, hi = power_table(w, max(n // 2, 1))
    return lo, hi


@functools.lru_cache(maxsize=None)
def _bit_reverse_perm(log_n: int):
    n = 1 << log_n
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


# Device-computed tables: inside a jit, a numpy table becomes a dense
# LITERAL in the lowered MLIR — multi-MB hex text per 2^20-point transform
# that blew past the remote-compile service's request-size limit on the
# tree-16 machine proof.  Building the same values with O(log n) traced ops
# keeps programs literal-free and bit-identical.

def _dev_bitrev(log_n: int):
    n = 1 << log_n
    idx = jnp.arange(n, dtype=jnp.int32)
    rev = jnp.zeros_like(idx)
    for b in range(log_n):
        rev = rev | (((idx >> b) & 1) << (log_n - 1 - b))
    return rev


def _dev_powers(base: int, count: int):
    """[base^0 .. base^(count-1)] as traced (lo, hi) uint32 arrays, built by
    log-doubling: P_{2k} = P_k ++ base^k·P_k (scalar constants only)."""
    lo = jnp.ones((1,), jnp.uint32)
    hi = jnp.zeros((1,), jnp.uint32)
    cur = base % P
    k = 1
    while k < count:
        ml = jnp.uint32(cur & 0xFFFFFFFF)
        mh = jnp.uint32(cur >> 32)
        nl, nh = gl.mul(lo, hi, ml, mh)
        lo = jnp.concatenate([lo, nl])
        hi = jnp.concatenate([hi, nh])
        cur = (cur * cur) % P
        k *= 2
    return lo[:count], hi[:count]


# Default-on size floor, set from the on-silicon validation sweep
# (evidence/pallas_ntt.json, TPU v5e, bit-exact + inverse round-trip at
# every size): measured speedup vs the stage-by-stage XLA path is
# 1.03x @ 2^12, 0.72x @ 2^14, 1.61x @ 2^16, 1.70x @ 2^18, 10.64x @ 2^20
# (four-stepped) — XLA's fused small stages win below 2^16, the
# kernel's ~3-HBM-pass economics win at and above it.
PALLAS_MIN_LOG_N = 16


def _use_pallas(log_n: int) -> bool:
    """Route supported sizes through the Pallas kernel on real TPU
    (ntt/pallas_ntt.py: ~3 HBM passes instead of ~2·log_n).

    Default: ON for log_n ≥ PALLAS_MIN_LOG_N where the measured on-chip
    speedup justifies it (see above).  VECTORX_PALLAS_NTT=0 forces the
    XLA path everywhere; =1 forces Pallas for every supported size."""
    import os

    mode = os.environ.get("VECTORX_PALLAS_NTT", "auto")
    if mode == "0":
        return False
    from vectorx_tpu.ntt import pallas_ntt

    if not pallas_ntt.supported(log_n):
        return False
    if mode != "1" and log_n < PALLAS_MIN_LOG_N:
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.partial(jax.jit, static_argnums=(2, 3))
def _transform_xla(lo, hi, log_n: int, inverse: bool):
    """Stage-by-stage XLA butterfly transform — the non-dispatching
    reference path.  Benchmarks and the Pallas-validation driver pin to
    this entry point so a Pallas-vs-XLA comparison can never silently
    become Pallas-vs-Pallas (round-4 ADVICE, high)."""
    n = 1 << log_n
    assert lo.shape[-1] == n
    perm = _dev_bitrev(log_n)
    lo = jnp.take(lo, perm, axis=-1)
    hi = jnp.take(hi, perm, axis=-1)
    w = _root_of_unity(log_n, inverse)
    twl, twh = _dev_powers(w, max(n // 2, 1))
    batch = lo.shape[:-1]
    for s in range(log_n):
        m = 1 << s                 # half-block size at this stage
        stride = n // (2 * m)
        wl = jax.lax.slice(twl, (0,), (n // 2,), (stride,)) if log_n > 0 else twl
        wh = jax.lax.slice(twh, (0,), (n // 2,), (stride,)) if log_n > 0 else twh
        wl = wl[:m]
        wh = wh[:m]
        x0l = lo.reshape(*batch, n // (2 * m), 2, m)
        x0h = hi.reshape(*batch, n // (2 * m), 2, m)
        el, eh = x0l[..., 0, :], x0h[..., 0, :]
        ol, oh = x0l[..., 1, :], x0h[..., 1, :]
        tl, th = gl.mul(ol, oh, wl, wh)
        ul, uh = gl.add(el, eh, tl, th)
        vl, vh = gl.sub(el, eh, tl, th)
        lo = jnp.stack([ul, vl], axis=-2).reshape(*batch, n)
        hi = jnp.stack([uh, vh], axis=-2).reshape(*batch, n)
    if inverse:
        n_inv = pow(n, P - 2, P)
        cl = jnp.uint32(n_inv & 0xFFFFFFFF)
        ch = jnp.uint32(n_inv >> 32)
        lo, hi = gl.mul(lo, hi, cl, ch)
    return lo, hi


def _transform(lo, hi, log_n: int, inverse: bool):
    """Dispatching transform: Pallas kernel when the gate + size + platform
    allow it, else the stage-by-stage XLA path.  The dispatch decision is
    made OUTSIDE any jit cache of its own (the two branches carry their own
    jits), so flipping VECTORX_PALLAS_NTT between calls can never serve a
    stale cached branch."""
    if _use_pallas(log_n):
        from vectorx_tpu.ntt import pallas_ntt

        return pallas_ntt.transform_any(lo, hi, log_n, inverse)
    return _transform_xla(lo, hi, log_n, inverse)


def ntt(lo, hi):
    """Coefficients -> evaluations over the size-n subgroup (natural order)."""
    n = lo.shape[-1]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n, "length must be a power of two"
    return _transform(lo, hi, log_n, inverse=False)


def intt(lo, hi):
    """Evaluations (natural order) -> coefficients."""
    n = lo.shape[-1]
    log_n = int(n).bit_length() - 1
    assert 1 << log_n == n
    return _transform(lo, hi, log_n, inverse=True)


def coset_ntt(lo, hi, shift: int = gl.GENERATOR):
    """Coefficients -> evaluations over the coset shift·K, |K| = n."""
    n = lo.shape[-1]
    sl, sh = _dev_powers(shift, n)
    lo, hi = gl.mul(lo, hi, sl, sh)
    return ntt(lo, hi)


def coset_intt(lo, hi, shift: int = gl.GENERATOR):
    """Evaluations over shift·K -> coefficients."""
    n = lo.shape[-1]
    cl, ch = intt(lo, hi)
    inv_shift = pow(shift, P - 2, P)
    sl, sh = _dev_powers(inv_shift, n)
    return gl.mul(cl, ch, sl, sh)


def lde(values_lo, values_hi, rate_bits: int = 3, shift: int = gl.GENERATOR):
    """Low-degree extension: evaluations on H (|H|=n, natural order) ->
    evaluations on the coset shift·K with |K| = n · 2^rate_bits.

    Mirrors plonky2's rate-8 (`rate_bits = 3`) LDE of witness polynomials
    (SURVEY.md §2 E1, §6).
    """
    cl, ch = intt(values_lo, values_hi)
    pad = [(0, 0)] * (cl.ndim - 1) + [(0, (values_lo.shape[-1] << rate_bits) - values_lo.shape[-1])]
    cl = jnp.pad(cl, pad)
    ch = jnp.pad(ch, pad)
    return coset_ntt(cl, ch, shift)
