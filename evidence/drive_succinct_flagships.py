"""Evidence driver: the succinct flagships at PRODUCTION FRI security
and REAL scale.

Round-2 verdict: every flagship number was measured at toy FRI configs
(2-12 queries, pow 0-1 — ~7-24 conjectured bits).  Round-3 verdict: only
ever proven at tree_size=2 with ~200-B headers.  This driver proves the
product statements at the repo's default ~100-bit config (28 queries,
16 pow bits, rate 1/8 — fri/fri.py, matching the reference's plonky2
standard config), over a commitment tree of `--tree` leaves (default 16)
with ~`--header-bytes` encoded headers (default 2048 — Avail-realistic;
the reference's bound is 35,840 B, consts.rs:9-16), and records honest
prove/verify seconds + tamper rejections.

Usage:  python evidence/drive_succinct_flagships.py [header_range|rotate|all]
            [--tree N] [--header-bytes B] [--queries N] [--pow N]
            [--authorities N] [--uniform-headers]
Writes  evidence/succinct_flagships.json (section-checkpointed).
"""

import dataclasses
import json
import logging
import os
import sys
import time

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s %(name)s: %(message)s")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

# Force backend init NOW and log it: the remote-TPU tunnel's failure mode
# is a silent hang at claim time (a round-5 flagship run sat 40 min in
# wait_woken with zero progress).  An explicit early device op makes the
# hang visible in the log within seconds of launch instead of being
# indistinguishable from a long compile.
_t0 = time.time()
import jax.numpy as _jnp  # noqa: E402

float(_jnp.arange(4.0).sum())
logging.getLogger("drive").info("backend ready in %.1fs: %s",
                                time.time() - _t0,
                                jax.devices()[0])

from vectorx_tpu.fri.fri import FriConfig            # noqa: E402
from vectorx_tpu.hash.sha256 import chained_hash     # noqa: E402
from vectorx_tpu.io.abi import HeaderRangeInput, RotateInput  # noqa: E402
from vectorx_tpu.io.fixtures import FixtureChain     # noqa: E402
from vectorx_tpu.stark.prover import StarkConfig     # noqa: E402

def _mk_chain(tree: int, header_bytes: int, n_auth: int = 4,
              mixed: bool = True):
    """A fixture chain whose era 1 covers (trusted, trusted + tree].

    Round-4 verdict (weak #7): flagship fixtures were degenerate —
    1 authority/era, uniform header sizes.  Defaults now follow the
    reference's test realism (≥4 authorities, header_range.rs:101-277;
    mixed sizes up to the --header-bytes bound, consts.rs:9-16):
    `mixed` cycles headers through 100%/10%/60%/25% of the bound."""
    epoch = 2 * tree
    base = max(0, header_bytes - 180)
    if mixed:
        frac = (100, 10, 60, 25)

        def ext(n, _base=base, _frac=frac):
            return _base * _frac[n % len(_frac)] // 100
    else:
        ext = base
    return FixtureChain(seed=19, num_blocks=3 * tree + 2, epoch_length=epoch,
                        authorities_per_era=lambda e: n_auth,
                        extension_bytes=ext), epoch


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


def _peak_hbm_gb():
    """Device peak-bytes-in-use (TPU allocator stat), for the record."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        return round(peak / 2**30, 2) if peak else None
    except Exception:  # noqa: BLE001 — stat support varies by backend
        return None


def run_header_range(cfg, tree: int, header_bytes: int, n_auth: int,
                     mixed: bool):
    from vectorx_tpu.circuits.succinct_header_range import (
        prove_header_range_succinct, verify_header_range_succinct)

    chain, epoch = _mk_chain(tree, header_bytes, n_auth, mixed)
    trusted, target = epoch, epoch + tree
    inp = HeaderRangeInput(trusted, chain.get_block_hash(trusted), 1,
                           chained_hash(chain.era_pubkeys(1)), target)
    hdr_lens = [len(chain.get_encoded_header(b))
                for b in range(trusted + 1, target + 1)]
    t0 = time.time()
    proof = prove_header_range_succinct(chain, inp.encode(), tree_size=tree,
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
        "statement": f"header_range {tree} headers (hidden, "
                     f"{min(hdr_lens)}-{max(hdr_lens)} B) + commitment "
                     "trees + in-ZK GRANDPA justification, ONE machine "
                     "proof; verifier sees ONLY (input_bytes, output_bytes, "
                     "proof)",
        "tree_size": tree,
        "authorities": n_auth, "mixed_header_sizes": mixed,
        "header_bytes_min": min(hdr_lens), "header_bytes_max": max(hdr_lens),
        "machine_rows": _machine_rows(),
        "prove_s": round(t1 - t0, 1), "verify_s": round(t2 - t1, 1),
        "tamper_check_s": round(t3 - t2, 1),
        "peak_hbm_gb": _peak_hbm_gb(),
        "verified": ok, "tamper_rejected": rej,
    }


def run_rotate(cfg, header_bytes: int, n_auth: int):
    from vectorx_tpu.circuits.succinct_rotate import (
        prove_rotate_succinct, verify_rotate_succinct)

    max_auth = max(8, n_auth)
    chain = FixtureChain(seed=19, num_blocks=12, epoch_length=6,
                         authorities_per_era=lambda e: n_auth,
                         extension_bytes=max(0, header_bytes - 180))
    epoch_end = len(chain.get_encoded_header(12))
    inp = RotateInput(1, chained_hash(chain.era_pubkeys(1)))
    t0 = time.time()
    proof = prove_rotate_succinct(chain, inp.encode(),
                                  max_authorities=max_auth, config=cfg)
    t1 = time.time()
    ok = verify_rotate_succinct(proof, max_authorities=max_auth, config=cfg)
    t2 = time.time()
    assert ok
    bad = dataclasses.replace(proof, output_bytes=b"\x11" * 32)
    rej = not verify_rotate_succinct(bad, max_authorities=max_auth,
                                     config=cfg)
    t3 = time.time()
    return {
        "statement": "rotate: hidden epoch-end header "
                     f"({epoch_end} B), in-tape consensus-log "
                     "walk + validator scan, in-ZK justification, ONE "
                     "machine proof; verifier sees ONLY (set_id, set_hash) "
                     "-> new_set_hash",
        "epoch_end_header_bytes": epoch_end,
        "authorities": n_auth,
        "machine_rows": _machine_rows(),
        "prove_s": round(t1 - t0, 1), "verify_s": round(t2 - t1, 1),
        "tamper_check_s": round(t3 - t2, 1),
        "peak_hbm_gb": _peak_hbm_gb(),
        "verified": ok, "tamper_rejected": rej,
    }


_ROWS = {}


def _machine_rows():
    return _ROWS.get("rows")


def main():
    args = sys.argv[1:]
    which = args[0] if args and not args[0].startswith("-") else "all"
    tree = int(args[args.index("--tree") + 1]) if "--tree" in args else 16
    hb = (int(args[args.index("--header-bytes") + 1])
          if "--header-bytes" in args else 2048)
    n_auth = (int(args[args.index("--authorities") + 1])
              if "--authorities" in args else 4)
    mixed = "--uniform-headers" not in args
    cfg, q, pw = _cfg(args)

    # record actual machine-trace rows via a prove hook
    from vectorx_tpu.recursion import machine as _m
    orig = _m.MachineAir.__init__

    def hooked(self, *a, **kw):
        orig(self, *a, **kw)
        _ROWS["rows"] = max(_ROWS.get("rows", 0), self.n)
    _m.MachineAir.__init__ = hooked

    out = os.path.join(os.path.dirname(__file__), "succinct_flagships.json")
    record = {
        "backend": jax.devices()[0].platform,
        "fri_config": {"rate_bits": 3, "cap_height": 1, "num_queries": q,
                       "final_poly_len": 4, "pow_bits": pw},
        "security_note": "28 queries @ rate 1/8 + 16 pow bits ~= 100-bit "
                         "conjectured (plonky2 standard)" if (q, pw) ==
                         (28, 16) else f"{q} queries + {pw} pow bits",
        "sections": {},
    }
    if os.path.exists(out):     # resume: keep prior sections
        try:
            with open(out) as f:
                prior = json.load(f)
            if prior.get("fri_config") == record["fri_config"]:
                record["sections"] = prior.get("sections", {})
        except ValueError:
            pass

    def checkpoint():
        with open(out + ".tmp", "w") as f:
            json.dump(record, f, indent=2)
            f.write("\n")
        os.replace(out + ".tmp", out)

    sections = (["header_range", "rotate"] if which == "all" else [which])
    for name in sections:
        _ROWS.clear()
        t0 = time.time()
        try:
            if name == "header_range":
                rec = run_header_range(cfg, tree, hb, n_auth, mixed)
            else:
                rec = run_rotate(cfg, hb, n_auth)
        except Exception as e:  # noqa: BLE001 — record failures honestly
            rec = {"error": f"{type(e).__name__}: {e}",
                   "elapsed_s": round(time.time() - t0, 1),
                   "peak_hbm_gb": _peak_hbm_gb()}
        record["sections"][name] = rec
        checkpoint()
        print(name, json.dumps(rec)[:300], flush=True)
    print(json.dumps(record)[:400])


if __name__ == "__main__":
    main()
