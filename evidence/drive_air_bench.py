"""Post-vectorization AIR proving benchmarks (VERDICT r2 weak-item 1).

Measures, on whatever backend runs it (intended: the real TPU):
  (a) the 300-pubkey authority-set commitment — 300 chained SHA-256
      compressions in batched multi-message traces,
  (b) FpMul AIR prove at log_n=10 (1023 GF(2^255-19) muls) — the number
      that replaces README's stale pre-vectorization 206 s.

Writes evidence/air_bench.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402

from vectorx_tpu.circuits.zk_commitment import (  # noqa: E402
    prove_authority_commitment, verify_authority_commitment)
from vectorx_tpu.fri.fri import FriConfig          # noqa: E402
from vectorx_tpu.stark.prover import StarkConfig, prove  # noqa: E402
from vectorx_tpu.stark.verifier import verify      # noqa: E402

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=12,
                                final_poly_len=4, pow_bits=8))


def bench_commitment_300():
    rng = np.random.default_rng(3)
    pubkeys = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
               for _ in range(300)]
    t0 = time.time()
    proof = prove_authority_commitment(pubkeys, CFG)
    t1 = time.time()
    ok = verify_authority_commitment(proof, CFG)
    t2 = time.time()
    assert ok
    return {"n_pubkeys": 300, "n_batched_proofs": len(proof.step_proofs),
            "prove_s": round(t1 - t0, 1), "verify_s": round(t2 - t1, 1)}


def bench_fpmul_1023():
    from vectorx_tpu.stark.ed25519_air import FpMulAir

    rng = np.random.default_rng(4)
    q = (1 << 255) - 19
    pairs = [(int(rng.integers(0, 2**62)) * int(rng.integers(0, 2**62)) % q,
              int(rng.integers(0, 2**62))) for _ in range(1023)]
    t0 = time.time()
    air = FpMulAir(10, pairs)
    trace = air.build_trace()
    t1 = time.time()
    proof = prove(air, trace, CFG)
    t2 = time.time()
    ok = verify(air, proof, CFG)
    t3 = time.time()
    assert ok
    return {"n_muls": len(pairs), "log_n": air.log_n,
            "witness_s": round(t1 - t0, 1), "prove_s": round(t2 - t1, 1),
            "verify_s": round(t3 - t2, 1)}


def main():
    record = {"backend": jax.devices()[0].platform}
    record["authority_commitment_300"] = bench_commitment_300()
    print("commitment:", record["authority_commitment_300"], flush=True)
    record["fpmul_1023"] = bench_fpmul_1023()
    print("fpmul:", record["fpmul_1023"], flush=True)
    out = os.path.join(os.path.dirname(__file__), "air_bench.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
