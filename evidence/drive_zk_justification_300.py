"""Evidence driver: a 300-authority GRANDPA justification through the ZK
path at PRODUCTION FRI security.

The reference's bound is 300 signatures in one conditional batch
(/root/reference/circuits/consts.rs:52,
/root/reference/circuits/builder/justification.rs:237-243).  Round-4
verdict (missing #3): our ladder evidence covered 16 signatures and the
300-authority claim was a 19-batch extrapolation.  This driver proves ONE
full justification from a 300-authority fixture era — every enabled
signature's SHA-512 challenge child, every ed25519 ladder child, and the
300-pubkey commitment chain — then verifies and tamper-checks it, and
records honest per-phase seconds.

Usage:  python evidence/drive_zk_justification_300.py [--authorities N]
            [--queries N] [--pow N]
Writes  evidence/zk_justification_300.json
"""

import dataclasses
import json
import logging
import os
import sys
import time

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s: %(message)s")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

# early device op: a tunnel-claim hang shows up in the log immediately
# (see drive_succinct_flagships.py)
_t0 = time.time()
import jax.numpy as _jnp  # noqa: E402

float(_jnp.arange(4.0).sum())
print(f"backend ready in {time.time() - _t0:.1f}s: {jax.devices()[0]}",
      flush=True)

from vectorx_tpu.fri.fri import FriConfig            # noqa: E402
from vectorx_tpu.hash.sha256 import chained_hash     # noqa: E402
from vectorx_tpu.io.fixtures import FixtureChain     # noqa: E402
from vectorx_tpu.stark.prover import StarkConfig     # noqa: E402


def _peak_hbm_gb():
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        return round(peak / 2**30, 2) if peak else None
    except Exception:  # noqa: BLE001 — stat support varies by backend
        return None


def main():
    args = sys.argv[1:]

    def _i(flag, default):
        return (int(args[args.index(flag) + 1]) if flag in args else default)

    n_auth = _i("--authorities", 300)
    q = _i("--queries", 28)
    pw = _i("--pow", 16)
    cfg = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=q,
                                    final_poly_len=4, pow_bits=pw))

    from vectorx_tpu.circuits.zk_justification import (
        prove_justification_zk, verify_justification_zk)

    chain = FixtureChain(seed=31, num_blocks=8, epoch_length=4,
                         authorities_per_era=lambda e: n_auth)
    block = 3
    j = chain.get_justification(block)
    set_hash = chained_hash(chain.era_pubkeys(j.authority_set_id))
    enabled = sum(bool(x) for x in j.validator_signed)
    print(f"authorities={j.num_authorities} enabled_sigs={enabled} "
          f"fri=q{q}/pow{pw}", flush=True)

    t0 = time.time()
    proof = prove_justification_zk(j, set_hash, cfg)
    t1 = time.time()
    ok = verify_justification_zk(proof, block, j.block_hash,
                                 j.authority_set_id, set_hash, cfg)
    t2 = time.time()
    assert ok

    # tamper: flip one bit in one ladder-child signature's public data
    bad_sigs = list(proof.signatures)
    first = next(i for i in range(proof.num_authorities)
                 if proof.validator_signed[i])
    bad_sigs[first] = bytes([proof.signatures[first][0] ^ 1]) \
        + proof.signatures[first][1:]
    bad = dataclasses.replace(proof, signatures=bad_sigs)
    rej = not verify_justification_zk(bad, block, j.block_hash,
                                      j.authority_set_id, set_hash, cfg)
    t3 = time.time()

    rec = {
        "backend": jax.devices()[0].platform,
        "statement": f"GRANDPA justification, {j.num_authorities}-authority "
                     f"set, {enabled} enabled ed25519 signatures over the "
                     "53-B precommit; SHA-512 challenge children + ladder "
                     "children + 300-pubkey commitment chain, all STARKs at "
                     "production FRI",
        "fri_config": {"rate_bits": 3, "cap_height": 1, "num_queries": q,
                       "final_poly_len": 4, "pow_bits": pw},
        "num_authorities": j.num_authorities,
        "enabled_signatures": enabled,
        "sha_chunks": len(proof.sha_proofs),
        "ladder_chunks": len(proof.ladder_proofs),
        "prove_s": round(t1 - t0, 1),
        "verify_s": round(t2 - t1, 1),
        "tamper_check_s": round(t3 - t2, 1),
        "peak_hbm_gb": _peak_hbm_gb(),
        "verified": ok, "tamper_rejected": rej,
    }
    out = os.path.join(os.path.dirname(__file__), "zk_justification_300.json")
    with open(out + ".tmp", "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    os.replace(out + ".tmp", out)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
