"""Evidence driver: round-2 flagship statements at PRODUCTION FRI security.

Round-2 VERDICT item 3: "no headline claim rests on a 2-query proof".
This driver re-proves the non-succinct flagships at the repo default
~100-bit config (28 queries + 16 pow bits @ rate 1/8 — fri/fri.py,
plonky2's standard conjectured security) and records honest prove/verify
seconds.  The succinct header_range/rotate products have their own driver
(drive_succinct_flagships.py).

Sections (each checkpointed into evidence/prod_flagships.json as it
finishes, so a timeout never loses completed measurements):

  hash_chain      — the 3-header hidden Blake2b hash chain, ONE machine
                    proof (recursion/succinct.py)
  commitment_300  — the 300-pubkey chained-SHA256 authority-set
                    commitment in ZK (circuits/zk_commitment.py; ref
                    justification.rs:127-162 semantics)
  ladder_batch    — ONE full ed25519 ladder batch: 16 real signatures
                    (the MAX_LADDER_ROWS packing unit of
                    circuits/zk_justification.py) proving
                    [S]B = R + [h]A per sig (ref justification.rs:237-243)

Usage: python evidence/drive_prod_flagships.py [section ...]
                                               [--queries N] [--pow N]
       (default: all three sections, production config; the overrides
        exist for smoke-testing the driver — overridden runs are labeled
        honestly in the record)
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

from vectorx_tpu.fri.fri import FriConfig          # noqa: E402
from vectorx_tpu.stark.prover import StarkConfig   # noqa: E402

def _cfg_from_args(args):
    q, pw = 28, 16
    if "--queries" in args:
        q = int(args[args.index("--queries") + 1])
    if "--pow" in args:
        pw = int(args[args.index("--pow") + 1])
    cfg = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1,
                                    num_queries=q, final_poly_len=4,
                                    pow_bits=pw))
    note = {"rate_bits": 3, "cap_height": 1, "num_queries": q,
            "final_poly_len": 4, "pow_bits": pw,
            "security_note": "28 queries @ rate 1/8 + 16 pow bits ~= "
                             "100-bit conjectured (plonky2 standard)"
                             if (q, pw) == (28, 16) else
                             f"SMOKE CONFIG: {q} queries + {pw} pow bits"}
    return cfg, note


CFG, FRI_NOTE = _cfg_from_args(sys.argv[1:])
# smoke-only size overrides (production defaults: 300 pubkeys, 16 sigs)
N_PUBKEYS = int(sys.argv[sys.argv.index("--pubkeys") + 1]) \
    if "--pubkeys" in sys.argv else 300
N_SIGS = int(sys.argv[sys.argv.index("--sigs") + 1]) \
    if "--sigs" in sys.argv else 16
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "prod_flagships.json" if FRI_NOTE["num_queries"] == 28
                   else "prod_flagships_smoke.json")


def _checkpoint(record):
    record["backend"] = jax.devices()[0].platform
    record["fri_config"] = FRI_NOTE
    old = {}
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                old = json.load(f)
        except (OSError, ValueError):
            pass
    old.update(record)
    with open(OUT + ".tmp", "w") as f:
        json.dump(old, f, indent=2)
        f.write("\n")
    os.replace(OUT + ".tmp", OUT)
    print(json.dumps(record), flush=True)


def run_hash_chain():
    from vectorx_tpu.recursion.succinct import (prove_hash_chain,
                                                verify_hash_chain)

    h0 = b"\xAA" * 32 + b"payload-zero" * 3
    h1 = hashlib.blake2b(h0, digest_size=32).digest() + b"payload-one" * 3
    h2 = hashlib.blake2b(h1, digest_size=32).digest() + b"payload-two" * 4
    headers = [h0, h1, h2]
    trusted = h0[:32]
    final = hashlib.blake2b(h2, digest_size=32).digest()
    t0 = time.time()
    chain = prove_hash_chain(headers, CFG)
    t1 = time.time()
    ok = verify_hash_chain(trusted, final, chain, CFG)
    t2 = time.time()
    assert ok
    rej = not verify_hash_chain(trusted, b"\x00" * 32, chain, CFG)
    _checkpoint({"hash_chain": {
        "n_headers": len(headers), "prove_s": round(t1 - t0, 1),
        "verify_s": round(t2 - t1, 1), "verified": ok,
        "tamper_rejected": rej}})


def run_commitment_300():
    import numpy as np

    from vectorx_tpu.circuits.zk_commitment import (
        prove_authority_commitment, verify_authority_commitment)
    from vectorx_tpu.hash.sha256 import chained_hash

    import dataclasses

    rng = np.random.default_rng(3)
    pubkeys = [rng.integers(0, 256, 32, dtype=np.uint8).tobytes()
               for _ in range(N_PUBKEYS)]
    want = chained_hash(pubkeys)
    t0 = time.time()
    pf = prove_authority_commitment(pubkeys, CFG)
    t1 = time.time()
    ok = verify_authority_commitment(pf, CFG) and pf.commitment == want
    t2 = time.time()
    assert ok
    bad = dataclasses.replace(pf, commitment=b"\x00" * 32)
    rej = not verify_authority_commitment(bad, CFG)
    _checkpoint({"commitment_300": {
        "n_pubkeys": N_PUBKEYS, "n_batched_proofs": len(pf.step_proofs),
        "prove_s": round(t1 - t0, 1),
        "verify_s": round(t2 - t1, 1), "verified": ok,
        "tamper_rejected": rej}})


def run_ladder_batch():
    from vectorx_tpu.curves import ed25519 as ed
    from vectorx_tpu.curves.ed25519 import L as ED_L
    from vectorx_tpu.stark.ed25519_ladder_air import Ed25519LadderAir
    from vectorx_tpu.stark.prover import prove
    from vectorx_tpu.stark.verifier import verify

    msg = b"\x01" + b"\x42" * 32 + (20).to_bytes(4, "little") \
        + (7).to_bytes(8, "little") + (1).to_bytes(8, "little")
    sigs = []
    for i in range(N_SIGS):
        secret = bytes([i + 1]) * 32
        pk = ed.public_key(secret)
        sg = ed.sign(secret, msg)
        h = hashlib.sha512(sg[:32] + pk + msg).digest()
        sigs.append((pk, sg[:32], int.from_bytes(sg[32:], "little"),
                     int.from_bytes(h, "little") % ED_L))
    air = Ed25519LadderAir(sigs)
    t0 = time.time()
    tr = air.build_trace()
    t1 = time.time()
    pf = prove(air, tr, CFG)
    t2 = time.time()
    ok = verify(Ed25519LadderAir.statement(sigs), pf, CFG)
    t3 = time.time()
    assert ok
    bad = list(sigs)
    bad[0] = (bad[0][0], bad[0][1], (bad[0][2] + 1) % ED_L, bad[0][3])
    rej = not verify(Ed25519LadderAir.statement(bad), pf, CFG)
    _checkpoint({"ladder_batch": {
        "n_sigs": N_SIGS, "rows": air.n, "witness_s": round(t1 - t0, 1),
        "prove_s": round(t2 - t1, 1), "verify_s": round(t3 - t2, 1),
        "verified": ok, "tamper_rejected": rej,
        "note": "16 sigs = one MAX_LADDER_ROWS packing unit; a "
                "300-authority set is 19 such batches "
                "(circuits/zk_justification.py)"}})


SECTIONS = {"hash_chain": run_hash_chain,
            "commitment_300": run_commitment_300,
            "ladder_batch": run_ladder_batch}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    picks = [a for a in args if a in SECTIONS] or list(SECTIONS)
    for name in picks:
        SECTIONS[name]()


if __name__ == "__main__":
    main()
