"""Evidence driver: the succinct flagships at PRODUCTION FRI security.

Round-2 verdict: every flagship number was measured at toy FRI configs
(2-12 queries, pow 0-1 — ~7-24 conjectured bits).  This driver re-proves
the round-3 product statements at the repo's default ~100-bit config
(28 queries, 16 pow bits, rate 1/8 — fri/fri.py:42-49, matching the
reference's plonky2 standard config) and records honest prove/verify
seconds + tamper rejections.

Usage:  python evidence/drive_succinct_flagships.py [header_range|rotate]
                                                    [--queries N] [--pow N]
Writes  evidence/succinct_<which>.json.
"""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from vectorx_tpu.fri.fri import FriConfig            # noqa: E402
from vectorx_tpu.hash.sha256 import chained_hash     # noqa: E402
from vectorx_tpu.io.abi import HeaderRangeInput, RotateInput  # noqa: E402
from vectorx_tpu.io.fixtures import FixtureChain     # noqa: E402
from vectorx_tpu.stark.prover import StarkConfig     # noqa: E402

CHAIN = FixtureChain(seed=19, num_blocks=12, epoch_length=6,
                     authorities_per_era=lambda e: 1)


def _cfg(args):
    q = 28
    pw = 16
    if "--queries" in args:
        q = int(args[args.index("--queries") + 1])
    if "--pow" in args:
        pw = int(args[args.index("--pow") + 1])
    return StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1,
                                     num_queries=q, final_poly_len=4,
                                     pow_bits=pw)), q, pw


def run_header_range(cfg):
    from vectorx_tpu.circuits.succinct_header_range import (
        prove_header_range_succinct, verify_header_range_succinct)

    inp = HeaderRangeInput(7, CHAIN.get_block_hash(7), 1,
                           chained_hash(CHAIN.era_pubkeys(1)), 9)
    t0 = time.time()
    proof = prove_header_range_succinct(CHAIN, inp.encode(), tree_size=2,
                                        config=cfg)
    t1 = time.time()
    ok = verify_header_range_succinct(proof, config=cfg)
    t2 = time.time()
    assert ok
    bad = dataclasses.replace(
        proof, output_bytes=proof.output_bytes[:40]
        + bytes([proof.output_bytes[40] ^ 1]) + proof.output_bytes[41:])
    rej = not verify_header_range_succinct(bad, config=cfg)
    t3 = time.time()
    return {
        "statement": "header_range 2 headers (hidden) + commitment trees + "
                     "in-ZK GRANDPA justification, ONE machine proof; "
                     "verifier sees ONLY (input_bytes, output_bytes, proof)",
        "machine_rows": _machine_rows(),
        "prove_s": round(t1 - t0, 1), "verify_s": round(t2 - t1, 1),
        "tamper_check_s": round(t3 - t2, 1),
        "verified": ok, "tamper_rejected": rej,
    }


def run_rotate(cfg):
    from vectorx_tpu.circuits.succinct_rotate import (
        prove_rotate_succinct, verify_rotate_succinct)

    inp = RotateInput(1, chained_hash(CHAIN.era_pubkeys(1)))
    t0 = time.time()
    proof = prove_rotate_succinct(CHAIN, inp.encode(), max_authorities=8,
                                  config=cfg)
    t1 = time.time()
    ok = verify_rotate_succinct(proof, max_authorities=8, config=cfg)
    t2 = time.time()
    assert ok
    bad = dataclasses.replace(proof, output_bytes=b"\x11" * 32)
    rej = not verify_rotate_succinct(bad, max_authorities=8, config=cfg)
    t3 = time.time()
    return {
        "statement": "rotate: hidden epoch-end header, in-tape consensus-log "
                     "walk + validator scan, in-ZK justification, ONE "
                     "machine proof; verifier sees ONLY (set_id, set_hash) "
                     "-> new_set_hash",
        "machine_rows": _machine_rows(),
        "prove_s": round(t1 - t0, 1), "verify_s": round(t2 - t1, 1),
        "tamper_check_s": round(t3 - t2, 1),
        "verified": ok, "tamper_rejected": rej,
    }


_ROWS = {}


def _machine_rows():
    return _ROWS.get("rows")


def main():
    args = sys.argv[1:]
    which = args[0] if args and not args[0].startswith("-") else \
        "header_range"
    cfg, q, pw = _cfg(args)

    # record actual machine-trace rows via a prove hook
    from vectorx_tpu.recursion import machine as _m
    orig = _m.MachineAir.__init__

    def hooked(self, *a, **kw):
        orig(self, *a, **kw)
        _ROWS["rows"] = max(_ROWS.get("rows", 0), self.n)
    _m.MachineAir.__init__ = hooked

    runner = {"header_range": run_header_range, "rotate": run_rotate}[which]
    record = runner(cfg)
    record.update({
        "backend": jax.devices()[0].platform,
        "fri_config": {"rate_bits": 3, "cap_height": 1, "num_queries": q,
                       "final_poly_len": 4, "pow_bits": pw},
        "security_note": "28 queries @ rate 1/8 + 16 pow bits ~= 100-bit "
                         "conjectured (plonky2 standard)" if (q, pw) ==
                         (28, 16) else f"{q} queries + {pw} pow bits",
    })
    out = os.path.join(os.path.dirname(__file__), f"succinct_{which}.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
