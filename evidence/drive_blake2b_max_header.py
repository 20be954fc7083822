"""Max-shape feasibility (VERDICT r2 #8): ONE Blake2bAir proof of a
35,840-byte header — the reference MAX_HEADER_SIZE bound of 280 128-byte
chunks (/root/reference/circuits/consts.rs:9-16).  Records trace shape,
prove/verify wall time, and the tamper check.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python <this>   (or on TPU
with the normal env).  Writes evidence/blake2b_max_header.json."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402

from vectorx_tpu.fri.fri import FriConfig          # noqa: E402
from vectorx_tpu.hash.blake2b import blake2b_256   # noqa: E402
from vectorx_tpu.stark.blake2b_air import Blake2bAir  # noqa: E402
from vectorx_tpu.stark.prover import StarkConfig, prove  # noqa: E402
from vectorx_tpu.stark.verifier import verify      # noqa: E402

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=12,
                                final_poly_len=4, pow_bits=8))
MAX_HEADER = 280 * 128  # 35,840 B


def main():
    rng = np.random.default_rng(7)
    header = rng.integers(0, 256, size=MAX_HEADER, dtype=np.uint8).tobytes()
    t0 = time.time()
    air = Blake2bAir([header])
    digest = air.digest_bytes_list()[0]
    assert digest == blake2b_256(header)
    trace = air.build_trace()
    t1 = time.time()
    proof = prove(air, trace, CFG)
    t2 = time.time()
    ok = verify(air, proof, CFG)
    t3 = time.time()
    assert ok
    bad = Blake2bAir.statement([header], [b"\x00" * 32])
    rejected = not verify(bad, proof, CFG)
    record = {
        "statement": "Blake2b-256 of one 35,840-byte header (280 chunks) "
                     "in ONE proof — the reference MAX_HEADER_SIZE bound",
        "backend": jax.devices()[0].platform,
        "trace_width": air.width,
        "trace_rows": air.total_rows,
        "trace_n": air.n,
        "fri_config": {"rate_bits": 3, "cap_height": 1, "num_queries": 12,
                       "final_poly_len": 4, "pow_bits": 8},
        "witness_build_s": round(t1 - t0, 1),
        "prove_s": round(t2 - t1, 1),
        "verify_s": round(t3 - t2, 1),
        "verified": ok,
        "wrong_digest_rejected": rejected,
    }
    out = os.path.join(os.path.dirname(__file__), "blake2b_max_header.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
