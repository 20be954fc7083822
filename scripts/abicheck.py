#!/usr/bin/env python3
"""Compare two ABI JSON files on their canonical surface.

Used by CI (.github/workflows/contracts.yml) to check the hermetically
generated abi/VectorX.abi.json against the ABI forge actually compiled:
every (type, name, input types, output types, stateMutability) entry must
match, order-insensitive.  Internal-type labels and parameter names are
ignored (forge emits richer internalType strings than the source parser).

Usage: python3 scripts/abicheck.py committed.json regenerated.json
"""

from __future__ import annotations

import json
import sys


def surface(path: str) -> set:
    entries = set()
    for e in json.load(open(path)):
        ins = tuple(i["type"] for i in e.get("inputs", []))
        outs = tuple(o["type"] for o in e.get("outputs", []))
        entries.add((e["type"], e.get("name", ""), ins, outs,
                     e.get("stateMutability", "")))
    return entries


def main() -> int:
    a, b = surface(sys.argv[1]), surface(sys.argv[2])
    ok = True
    for missing in sorted(b - a):
        print(f"missing from committed ABI: {missing}", file=sys.stderr)
        ok = False
    for extra in sorted(a - b):
        print(f"committed ABI has entry forge did not emit: {extra}",
              file=sys.stderr)
        ok = False
    if ok:
        print(f"ABI surfaces match ({len(a)} entries)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
