"""Evidence driver: the aggregated header_range — every component STARK
folded into ONE verifier-VM proof, proven and verified end-to-end.

Run on the real TPU (no env prefix) or on CPU with
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu.  Writes
evidence/agg_header_range.json with sizes and timings.

This is the single-succinct-artifact shape of the reference's wrapped
map-reduce proof (/root/reference/circuits/header_range.rs:71-88): the
aggregate verifier checks the public wiring plus exactly ONE STARK.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from vectorx_tpu.circuits.zk_header_range import (   # noqa: E402
    aggregate_header_range_proof, prove_header_range_zk,
    verify_header_range_zk_aggregated)
from vectorx_tpu.fri.fri import FriConfig            # noqa: E402
from vectorx_tpu.hash.sha256 import chained_hash     # noqa: E402
from vectorx_tpu.io.abi import HeaderRangeInput      # noqa: E402
from vectorx_tpu.io.fixtures import FixtureChain     # noqa: E402
from vectorx_tpu.stark.prover import StarkConfig     # noqa: E402

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=8,
                                final_poly_len=4, pow_bits=0))
CHAIN = FixtureChain(seed=19, num_blocks=12, epoch_length=6,
                     authorities_per_era=lambda e: 4)


def main():
    inp = HeaderRangeInput(
        7, CHAIN.get_block_hash(7), 1, chained_hash(CHAIN.era_pubkeys(1)),
        9).encode()
    t0 = time.time()
    comp = prove_header_range_zk(CHAIN, inp, tree_size=2, max_authorities=8,
                                 config=CFG)
    t1 = time.time()
    agg = aggregate_header_range_proof(comp, config=CFG)
    t2 = time.time()
    print(f"components {t1-t0:.0f}s, aggregate prove {t2-t1:.0f}s",
          flush=True)
    ok = verify_header_range_zk_aggregated(agg, tree_size=2, config=CFG)
    t3 = time.time()
    assert ok, "aggregated header_range proof failed to verify"

    # tamper: flip one byte of a header hash -> wiring rejects
    agg.header_hashes = list(agg.header_hashes)
    good = agg.header_hashes[0]
    agg.header_hashes[0] = b"\x00" * 32
    tampered_rejected = not verify_header_range_zk_aggregated(
        agg, tree_size=2, config=CFG)
    agg.header_hashes[0] = good
    # tamper the single aggregated STARK -> rejects
    agg.aggregated_proof.trace_at_zeta[0] = (
        (agg.aggregated_proof.trace_at_zeta[0][0] + 1)
        % (2**64 - 2**32 + 1),
        agg.aggregated_proof.trace_at_zeta[0][1])
    stark_tamper_rejected = not verify_header_range_zk_aggregated(
        agg, tree_size=2, config=CFG)
    t4 = time.time()

    record = {
        "statement": "header_range tree=2 (blocks 8-9), all component "
                     "STARKs aggregated into ONE verifier-VM proof",
        "backend": jax.devices()[0].platform,
        "fri_config": {"rate_bits": 3, "cap_height": 0, "num_queries": 8,
                       "final_poly_len": 4, "pow_bits": 0},
        "n_component_proofs": len(comp.header_proofs) + len(comp.sha_proofs),
        "component_prove_s": round(t1 - t0, 1),
        "aggregate_prove_s": round(t2 - t1, 1),
        "aggregate_verify_s": round(t3 - t2, 1),
        "tamper_checks_s": round(t4 - t3, 1),
        "verified": ok,
        "tampered_wiring_rejected": tampered_rejected,
        "tampered_stark_rejected": stark_tamper_rejected,
    }
    out = os.path.join(os.path.dirname(__file__), "agg_header_range.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
