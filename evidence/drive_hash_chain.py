"""Evidence driver: the SUCCINCT hash chain — ONE machine proof that a
sequence of (hidden) headers hash-links from a trusted hash to a final
hash.  The verifier sees ONLY the two 32-byte hashes and the header sizes;
every header byte and intermediate hash is witness.

This is the core of the reference's header_range succinctness
(/root/reference/circuits/builder/subchain_verification.rs:148-200 parent
linkage inside recursively verified proofs).  Writes
evidence/hash_chain.json."""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from vectorx_tpu.fri.fri import FriConfig          # noqa: E402
from vectorx_tpu.stark.prover import StarkConfig   # noqa: E402
from vectorx_tpu.recursion.succinct import (       # noqa: E402
    prove_hash_chain, verify_hash_chain)

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=2,
                                final_poly_len=2, pow_bits=1))


def main():
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
    bad_final = not verify_hash_chain(trusted, b"\x00" * 32, chain, CFG)
    bad_trusted = not verify_hash_chain(b"\x00" * 32, final, chain, CFG)
    t3 = time.time()

    record = {
        "statement": "3 hidden headers hash-link trusted->final; verifier "
                     "sees ONLY the two hashes + header sizes",
        "backend": jax.devices()[0].platform,
        "n_headers": len(headers),
        "public_inputs": 16,
        "fri_config": {"rate_bits": 3, "cap_height": 1, "num_queries": 2,
                       "final_poly_len": 2, "pow_bits": 1},
        "prove_s": round(t1 - t0, 1),
        "verify_s": round(t2 - t1, 1),
        "tamper_checks_s": round(t3 - t2, 1),
        "verified": ok,
        "wrong_final_rejected": bad_final,
        "wrong_trusted_rejected": bad_trusted,
    }
    out = os.path.join(os.path.dirname(__file__), "hash_chain.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=2)
        f.write("\n")
    print(json.dumps(record))


if __name__ == "__main__":
    main()
