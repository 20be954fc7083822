"""Benchmark driver: Goldilocks NTT throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": "goldilocks_ntt", "value": <Gelem/s/chip>, "unit": "Gelem/s",
   "vs_baseline": <value / 1.0>, "extras": {...}}

The reference publishes no benchmark numbers (BASELINE.md), so
`vs_baseline` is measured against the repo's own speed-of-light anchor of
1.0 Gelem/s/chip for the radix-2 NTT (BASELINE.json north-star metric #1:
"Goldilocks NTT Gelem/s/chip").  Secondary metrics (Poseidon hashes/s,
Blake2b header hashes/s) ride along in "extras".
"""

import json
import time

import numpy as np


def _time(fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from vectorx_tpu.field import goldilocks as gl
    from vectorx_tpu.hash import poseidon
    from vectorx_tpu.hash.blake2b import blake2b_batch
    from vectorx_tpu.ntt import ntt

    extras = {}

    # --- NTT throughput (north-star metric #1) -----------------------------
    B, log_n = 16, 16
    n = 1 << log_n
    rng = np.random.default_rng(0)
    poly = rng.integers(0, gl.P, size=(B, n), dtype=np.uint64)
    pl, ph = gl.from_u64(poly)
    ntt_jit = jax.jit(lambda a, b: ntt(a, b))
    dt = _time(ntt_jit, pl, ph)
    ntt_gelems = B * n / dt / 1e9
    extras["ntt_batch"] = B
    extras["ntt_log_n"] = log_n
    extras["ntt_ms"] = round(dt * 1e3, 3)

    # --- Poseidon sponge throughput ---------------------------------------
    H = 1 << 15
    st = rng.integers(0, gl.P, size=(H, 8), dtype=np.uint64)
    sl, sh = gl.from_u64(st)
    dt = _time(poseidon.hash_no_pad, sl, sh)
    extras["poseidon_hashes_per_s"] = round(H / dt)

    # --- Blake2b header hashing -------------------------------------------
    HB, L = 256, 2048
    msgs = rng.integers(0, 256, size=(HB, L), dtype=np.uint8)
    lens = np.full(HB, L, dtype=np.uint32)
    t0 = time.perf_counter()
    blake2b_batch(msgs, lens)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    blake2b_batch(msgs, lens)
    dt = time.perf_counter() - t0
    extras["blake2b_2kb_headers_per_s"] = round(HB / dt)
    extras["device"] = str(jax.devices()[0])

    print(json.dumps({
        "metric": "goldilocks_ntt",
        "value": round(ntt_gelems, 4),
        "unit": "Gelem/s",
        "vs_baseline": round(ntt_gelems / 1.0, 4),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
