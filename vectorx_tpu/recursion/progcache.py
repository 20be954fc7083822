"""Content-addressed cache of statement-mode machine programs.

Every succinct product verifier re-derives a verifier-VM program from the
claimed statement (aggregate.py, circuits/succinct_header_range.py,
circuits/succinct_rotate.py, recursion/succinct.py) — a pure host-Python
tape walk that dominated verification in round 3 (92 s for a tree=2
aggregate).  The program is a pure function of the statement + FRI config,
so it is content-addressed here: a hit returns exactly what re-derivation
would, and the PROVE side seeds the cache with its own (witness-stripped)
program so the first verify of a fresh statement is already cheap.

Soundness: the key hashes the verifier's OWN derivation inputs (never
prover-supplied structures that aren't part of the statement), so a cache
hit cannot accept anything the rebuild wouldn't.  Witness-stripping is
sound because the tape structure is witness-independent by construction
(shadow.py builds identical tapes with or without a proof) —
regression-locked by
tests/test_recursion_aggregate.py::test_stripped_witness_program_matches_statement_rebuild.

Disk layer shares VECTORX_VK_CACHE with stark/vk.py ("0" disables).
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading
from dataclasses import replace

from vectorx_tpu.recursion.machine import Program

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


def digest_key(*parts) -> str:
    """Stable hex key from arbitrary statement parts (bytes/str/int/list
    nestings; order-sensitive)."""
    h = hashlib.sha256()

    def feed(p):
        if isinstance(p, bytes):
            h.update(b"b" + len(p).to_bytes(8, "little") + p)
        elif isinstance(p, str):
            feed(p.encode())
        elif isinstance(p, bool):
            h.update(b"o" + bytes([p]))
        elif isinstance(p, int):
            h.update(b"i" + repr(p).encode())
        elif p is None:
            h.update(b"n")
        elif isinstance(p, (list, tuple)):
            h.update(b"l" + len(p).to_bytes(8, "little"))
            for x in p:
                feed(x)
        else:
            raise TypeError(f"unhashable statement part: {type(p)}")

    feed(list(parts))
    return h.hexdigest()


def strip_witness(prog: Program) -> Program:
    """The statement-mode view of a witness-mode program (drop the value
    assignment; structure is witness-independent, see module docstring)."""
    return replace(prog, values=None, witness=False)


def get(key: str):
    """Cached (program, meta) for `key`, or None.  The returned program
    carries `_stmt_key = key` — its own content address — which
    stark/vk.py uses as a VK-cache token (MachineAir.vk_token) so warm
    verifies never rebuild or rehash the constant columns."""
    with _LOCK:
        hit = _MEM.get(key)
    if hit is not None:
        hit[0]._stmt_key = key
        return hit
    d = _disk_dir()
    if d:
        path = os.path.join(d, "mprog_" + key + ".pkl")
        try:
            with open(path, "rb") as f:
                hit = pickle.load(f)
            with _LOCK:
                _MEM[key] = hit
            hit[0]._stmt_key = key
            return hit
        except (OSError, pickle.PickleError, EOFError, AttributeError):
            pass
    return None


def put(key: str, prog: Program, meta=None) -> None:
    """Store a STATEMENT-mode program (strip witness first if needed)."""
    # the caller's (possibly witness-mode) program gets the same token:
    # constant columns are witness-independent (module docstring), so the
    # prove-side MachineAir seeds/hits the same VK-cache entry
    prog._stmt_key = key
    if prog.witness:
        prog = strip_witness(prog)
    else:
        # shallow dataclass copy: drops ad-hoc attributes (notably the
        # multi-hundred-MB MachineAir._consts_cache memo) so neither the
        # pickle nor the shared in-memory entry carries them on write
        prog = replace(prog)
    prog._stmt_key = key
    entry = (prog, meta)
    with _LOCK:
        _MEM[key] = entry
    d = _disk_dir()
    if d:
        path = os.path.join(d, "mprog_" + key + ".pkl")
        try:
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(entry, f)
            os.replace(tmp, path)
        except (OSError, pickle.PickleError):
            pass


def cached_program(key: str, build) -> Program:
    """`build()` must return a statement-mode Program; memoized by key."""
    hit = get(key)
    if hit is not None:
        return hit[0]
    prog = build()
    put(key, prog)
    return prog


def clear_memory_cache() -> None:
    with _LOCK:
        _MEM.clear()
