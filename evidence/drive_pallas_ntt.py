"""Evidence driver: validate + time the Pallas NTT on the real chip.

The Pallas single-pass kernel (ntt/pallas_ntt.py) is gated opt-in
(VECTORX_PALLAS_NTT=1) until validated on real silicon — interpret-mode
tests pin bit-exactness but not Mosaic lowering.  This driver, run on the
TPU, (a) checks the Pallas path bit-exact against the stage-by-stage XLA
path across the supported size range incl. one post-VMEM four-stepped
size, (b) times both with the marginal-cost method (extra in-jit
iterations) used by bench.py, and (c) records the speedup so the gate
default can be flipped with measured backing (round-3 VERDICT item 10:
beat the 1.0 Gelem/s anchor by >=2x or document why not).

Usage:  python evidence/drive_pallas_ntt.py            # on the TPU
Writes  evidence/pallas_ntt.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

# early device op: a tunnel-claim hang shows up immediately in the log
import time as _t
_t0 = _t.time()
import jax as _jax  # noqa: E402
import jax.numpy as _jnp  # noqa: E402
float(_jnp.arange(4.0).sum())
print(f"backend ready in {_t.time() - _t0:.1f}s: {_jax.devices()[0]}",
      flush=True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vectorx_tpu.field import goldilocks as gl  # noqa: E402
from vectorx_tpu.ntt import pallas_ntt  # noqa: E402
# the NON-dispatching XLA entry point: transform_any above bypasses the
# VECTORX_PALLAS_NTT gate, and _transform_xla can never route to Pallas —
# so this comparison cannot degrade to Pallas-vs-Pallas no matter what the
# shell exports (round-4 ADVICE, high)
from vectorx_tpu.ntt.ntt import _transform_xla  # noqa: E402


def _timed_marginal(f, k_hi=5, iters=5):
    """Marginal cost of one extra in-jit iteration (tunnel-tax-free)."""
    def reps(k):
        t_best = float("inf")
        int(f(k))  # warm/compile
        for _ in range(iters):
            t0 = time.perf_counter()
            int(f(k))
            t_best = min(t_best, time.perf_counter() - t0)
        return t_best
    t1, tk = reps(1), reps(k_hi)
    return max(tk - t1, 1e-9) / (k_hi - 1)


def main():
    dev = jax.devices()[0]
    rec = {"device": str(dev), "platform": dev.platform, "sizes": {}}
    rng = np.random.default_rng(11)

    for log_n, batch in ((12, 512), (14, 256), (16, 64), (18, 16), (20, 4)):
        n = 1 << log_n
        poly = rng.integers(0, gl.P, size=(batch, n), dtype=np.uint64)
        lo, hi = gl.from_u64(poly)
        lo, hi = jnp.asarray(lo), jnp.asarray(hi)

        # bit-exactness: Pallas vs XLA stage-by-stage, forward + inverse
        pal_l, pal_h = pallas_ntt.transform_any(lo, hi, log_n, False)
        xla_l, xla_h = _transform_xla(lo, hi, log_n, False)
        fwd_ok = (np.array_equal(np.asarray(pal_l), np.asarray(xla_l))
                  and np.array_equal(np.asarray(pal_h), np.asarray(xla_h)))
        inv_l, inv_h = pallas_ntt.transform_any(pal_l, pal_h, log_n, True)
        rt_ok = (np.array_equal(np.asarray(inv_l), np.asarray(lo))
                 and np.array_equal(np.asarray(inv_h), np.asarray(hi)))

        @jax.jit
        def pal_reps(lo, hi, k):
            def body(_, c):
                return pallas_ntt.transform_any(c[0], c[1], log_n, False)
            l, h = jax.lax.fori_loop(0, k, body, (lo, hi))
            return jnp.sum(l, dtype=jnp.uint32)

        @jax.jit
        def xla_reps(lo, hi, k):
            def body(_, c):
                return _transform_xla(c[0], c[1], log_n, False)
            l, h = jax.lax.fori_loop(0, k, body, (lo, hi))
            return jnp.sum(l, dtype=jnp.uint32)

        t_pal = _timed_marginal(lambda k: pal_reps(lo, hi, k))
        t_xla = _timed_marginal(lambda k: xla_reps(lo, hi, k))
        gelems_pal = batch * n / t_pal / 1e9
        gelems_xla = batch * n / t_xla / 1e9
        rec["sizes"][str(log_n)] = {
            "batch": batch,
            "bit_exact_vs_xla": bool(fwd_ok),
            "inverse_round_trip": bool(rt_ok),
            "pallas_ms": round(t_pal * 1e3, 3),
            "xla_ms": round(t_xla * 1e3, 3),
            "pallas_gelem_s": round(gelems_pal, 3),
            "xla_gelem_s": round(gelems_xla, 3),
            "speedup": round(t_xla / t_pal, 2),
        }
        print(f"log_n={log_n}: exact={fwd_ok} rt={rt_ok} "
              f"pallas {gelems_pal:.2f} vs xla {gelems_xla:.2f} Gelem/s "
              f"({t_xla / t_pal:.2f}x)", flush=True)
        out = os.path.join(os.path.dirname(__file__), "pallas_ntt.json")
        with open(out, "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")

    print("wrote evidence/pallas_ntt.json")


if __name__ == "__main__":
    main()
