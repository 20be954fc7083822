"""On-chip bit-exactness of the four-step Pallas NTT at PROVER sizes.

The validation sweep (drive_pallas_ntt.py → pallas_ntt.json) covers
2^12..2^20; the flagship machine proofs transform at 2^21 (trace iNTT)
through 2^24 (LDE domain).  Those route through the same transform_big
composition, but this driver pins the exact sizes the prover now
dispatches (ntt.PALLAS_MIN_LOG_N default-on) before any long prove
relies on them.

Usage:  python evidence/drive_pallas_big.py
Writes  evidence/pallas_ntt_big.json
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
from vectorx_tpu.ntt.ntt import _transform_xla  # noqa: E402


def main():
    rng = np.random.default_rng(23)
    rec = {"device": str(jax.devices()[0]), "sizes": {}}
    out = os.path.join(os.path.dirname(__file__), "pallas_ntt_big.json")
    for log_n in (21, 22, 24):
        n = 1 << log_n
        x = rng.integers(0, gl.P, size=(1, n), dtype=np.uint64)
        lo, hi = gl.from_u64(x)
        t0 = time.time()
        pl_, ph_ = jax.jit(
            lambda a, b, ln=log_n: pallas_ntt.transform_any(a, b, ln, False)
        )(lo, hi)
        jax.block_until_ready((pl_, ph_))
        pallas_s = time.time() - t0
        t0 = time.time()
        rl, rh = jax.jit(
            lambda a, b, ln=log_n: _transform_xla(a, b, ln, False))(lo, hi)
        jax.block_until_ready((rl, rh))
        xla_s = time.time() - t0
        exact = (bool(jnp.array_equal(*map(jnp.asarray, (pl_, rl))))
                 and bool(jnp.array_equal(*map(jnp.asarray, (ph_, rh)))))
        # inverse round-trip through the same dispatch
        il, ih = jax.jit(
            lambda a, b, ln=log_n: pallas_ntt.transform_any(a, b, ln, True)
        )(pl_, ph_)
        cl, ch = jax.jit(gl.canonicalize)(il, ih)
        rt = bool(np.array_equal(
            np.asarray(jax.device_get(cl)).astype(np.uint64)
            | (np.asarray(jax.device_get(ch)).astype(np.uint64) << 32), x))
        rec["sizes"][str(log_n)] = {
            "bit_exact_vs_xla": exact, "inverse_round_trip": rt,
            "pallas_first_call_s": round(pallas_s, 1),
            "xla_first_call_s": round(xla_s, 1),
        }
        print(f"log_n={log_n}: exact={exact} rt={rt} "
              f"(first-call {pallas_s:.1f}s vs {xla_s:.1f}s)", flush=True)
        with open(out + ".tmp", "w") as f:
            json.dump(rec, f, indent=2)
            f.write("\n")
        os.replace(out + ".tmp", out)
        assert exact and rt, f"mismatch at 2^{log_n}"
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
