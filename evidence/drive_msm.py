"""Evidence driver: Pippenger MSM vs the batched double-and-add ladder.

BASELINE north-star metric #2 partner (round-3 VERDICT item 6): measure
the witness-side batch verification of 300 GRANDPA signatures (601-point
MSM, /root/reference/circuits/builder/justification.rs:237-243 semantics)
with both device pipelines and record the crossover:

  ladder — one 253-step double-and-add scan over all points
           (curves/ed25519_batch.py::scalar_mult_batched)
  msm    — windowed Pippenger: one argsort, a log-depth segmented scan,
           batched bucket suffix reduction, Horner over windows
           (curves/ed25519_batch.py::msm)

Writes evidence/msm.json.  Usage:
  python evidence/drive_msm.py [--sigs N] [--sizes 75,150,300]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

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

from vectorx_tpu.curves import ed25519 as ed          # noqa: E402
from vectorx_tpu.curves import ed25519_batch as eb    # noqa: E402


def _mk_sigs(n: int):
    msg = b"\x01" + b"\x42" * 32 + (20).to_bytes(4, "little") \
        + (7).to_bytes(8, "little") + (1).to_bytes(8, "little")
    pubkeys, msgs, sigs = [], [], []
    for i in range(n):
        secret = (i + 1).to_bytes(4, "little") * 8
        pubkeys.append(ed.public_key(secret))
        msgs.append(msg)
        sigs.append(ed.sign(secret, msg))
    return pubkeys, msgs, sigs


def _timed(fn, reps=3):
    fn()                       # warm + compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        assert fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    args = sys.argv[1:]
    sizes = [75, 150, 300]
    if "--sizes" in args:
        sizes = [int(x) for x in
                 args[args.index("--sizes") + 1].split(",")]
    if "--sigs" in args:
        sizes = [int(args[args.index("--sigs") + 1])]

    record = {"backend": jax.devices()[0].platform,
              "window_bits": eb.MSM_WINDOW, "points": {}, "sizes": {}}
    rng = np.random.default_rng(11)

    for n in sizes:
        pubkeys, msgs, sigs = _mk_sigs(n)
        fixed = (lambda: int.from_bytes(rng.bytes(16), "little"))
        t_ladder = _timed(lambda: eb.batch_verify(
            pubkeys, msgs, sigs, rng=fixed, method="ladder"))
        t_msm = _timed(lambda: eb.batch_verify(
            pubkeys, msgs, sigs, rng=fixed, method="msm"))
        npts = 2 * n + 1
        record["sizes"][str(n)] = {
            "n_points": npts,
            "ladder_s": round(t_ladder, 3),
            "msm_s": round(t_msm, 3),
            "ladder_points_per_s": round(npts / t_ladder, 1),
            "msm_points_per_s": round(npts / t_msm, 1),
            "speedup_msm_over_ladder": round(t_ladder / t_msm, 2),
        }
        print(json.dumps({n: record["sizes"][str(n)]}), flush=True)

    best = max(record["sizes"].values(),
               key=lambda r: max(r["ladder_points_per_s"],
                                 r["msm_points_per_s"]))
    record["fastest_points_per_s"] = max(best["ladder_points_per_s"],
                                         best["msm_points_per_s"])
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "msm.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps({"written": out}))


if __name__ == "__main__":
    main()
