"""Verification keys: content-addressed cache of constants caps.

The verifier's trust anchor for an AIR's preprocessed (constant) columns is
the Merkle CAP of their LDE commitment — `verify()` checks the proof's
constants openings against that cap and never touches the rest of the tree
(stark/verifier.py).  Deriving the cap, however, costs a full
iNTT + coset-NTT + Merkle build over the constant columns at LDE scale —
this was the dominant cost of aggregate verification (92 s at tree=2 in
round 2, re-run per child per verify).

This module memoizes cap derivation, content-addressed by the constant
columns themselves + the commitment parameters.  Soundness is unchanged:
the key is a hash of the verifier's OWN derivation inputs, so a cache hit
returns exactly what re-derivation would.  The cache is the TPU-native
analogue of the reference platform's circuit `build` step (a verification
key produced once and reused across proofs —
/root/reference/succinct.json:2-50 builds circuits separately from proving).

For `bind="public"` child AIRs the constant columns are a pure function of
the statement SHAPE, so one cached cap serves every statement of that
shape — the deployment's verification key.

Disk layer: set VECTORX_VK_CACHE=<dir> (default ~/.cache/vectorx/vk;
"0" disables the disk layer).  Entries are tiny JSON cap lists.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading

_MEM: dict = {}
_LOCK = threading.Lock()


def _disk_dir() -> str | None:
    d = os.environ.get("VECTORX_VK_CACHE")
    if d == "0":
        return None
    if not d:
        d = os.path.join(os.path.expanduser("~"), ".cache", "vectorx", "vk")
    try:
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return None


def cache_key(consts, config) -> str:
    h = hashlib.sha256()
    h.update(f"{consts.shape}:{config.fri.rate_bits}:"
             f"{config.fri.cap_height}:".encode())
    h.update(consts.tobytes())
    return h.hexdigest()


def constants_cap(air, config) -> list | None:
    """The AIR's verification key: cap of the preprocessed-columns
    commitment, derived once per (constant columns, commitment params) and
    memoized in memory + on disk.  Returns None when the AIR has no
    constant columns."""
    consts = air.constant_columns()
    if consts.shape[0] == 0:
        return None
    key = cache_key(consts, config)
    with _LOCK:
        cap = _MEM.get(key)
    if cap is not None:
        return cap
    d = _disk_dir()
    path = os.path.join(d, key + ".json") if d else None
    if path and os.path.exists(path):
        try:
            with open(path) as f:
                cap = json.load(f)
            with _LOCK:
                _MEM[key] = cap
            return cap
        except (OSError, ValueError):
            pass
    from vectorx_tpu.stark.prover import preprocess

    tree = preprocess(air, config)[0]
    cap = tree.cap_ints()
    with _LOCK:
        _MEM[key] = cap
    if path:
        try:
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(cap, f)
            os.replace(tmp, path)
        except OSError:
            pass
    return cap


def clear_memory_cache() -> None:
    with _LOCK:
        _MEM.clear()
