#!/usr/bin/env python3
"""Generate abi/VectorX.abi.json from the Solidity sources.

Reference-parity for scripts/abigen.sh (reference scripts/abigen.sh:1-24),
which extracts the ABI from forge's build output for ethers `abigen!`
(reference bin/vectorx.rs:16).  No Solidity toolchain ships in this build
environment, so this generator parses the external surface out of the
sources directly — functions, public state getters, events, errors — and
emits the same ethers-compatible JSON.  CI regenerates the ABI from the
real forge output and diffs it against this file
(.github/workflows/contracts.yml), so any parser drift is caught at the
first compile.

Usage: python3 scripts/abigen.py [--check]
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
SOURCES = [
    ROOT / "contracts/src/VectorX.sol",
    ROOT / "contracts/src/upgrades/TimelockedUpgradeable.sol",
]
IFACE = ROOT / "contracts/src/interfaces/IVectorX.sol"
OUT = ROOT / "abi/VectorX.abi.json"

ELEMENTARY = {"uint": "uint256", "int": "int256"}


def _strip(src: str) -> str:
    src = re.sub(r"//.*", "", src)
    return re.sub(r"/\*.*?\*/", "", src, flags=re.S)


def _canon(typ: str) -> str:
    base = typ.rstrip("[]")
    suffix = typ[len(base):]
    return ELEMENTARY.get(base, base) + suffix


def _params(raw: str, structs: dict) -> list[dict]:
    out = []
    raw = raw.strip()
    if not raw:
        return out
    for p in re.split(r",(?![^()]*\))", raw):
        toks = p.split()
        if not toks:
            continue
        typ = _canon(toks[0])
        name = toks[-1] if len(toks) > 1 and toks[-1] not in (
            "memory", "calldata", "storage") else ""
        if name in ("memory", "calldata", "storage"):
            name = ""
        entry: dict = {"internalType": typ, "name": name, "type": typ}
        base = typ.rstrip("[]")
        if base in structs:
            entry["type"] = "tuple" + typ[len(base):]
            entry["internalType"] = f"struct VectorX.{base}" + typ[len(base):]
            entry["components"] = structs[base]
        out.append(entry)
    return out


def _parse_structs(text: str) -> dict:
    structs = {}
    for m in re.finditer(r"struct\s+(\w+)\s*\{([^}]*)\}", text):
        comps = []
        for line in m.group(2).split(";"):
            toks = line.split()
            if len(toks) >= 2:
                typ = _canon(toks[0])
                comps.append({"internalType": typ, "name": toks[-1],
                              "type": typ})
        structs[m.group(1)] = comps
    return structs


def _parse_functions(text: str, structs: dict) -> list[dict]:
    out = []
    for m in re.finditer(
            r"function\s+(\w+)\s*\(([^)]*)\)\s*((?:[^;{])*?)[;{]", text):
        name, args, tail = m.group(1), m.group(2), m.group(3)
        if name.startswith("_") or name.startswith("__"):
            continue
        if not re.search(r"\b(external|public)\b", tail):
            continue
        mut = "nonpayable"
        if re.search(r"\bpayable\b", tail):
            mut = "payable"
        elif re.search(r"\bview\b", tail):
            mut = "view"
        elif re.search(r"\bpure\b", tail):
            mut = "pure"
        rm = re.search(r"returns\s*\(([^)]*)\)", tail)
        outputs = _params(rm.group(1), structs) if rm else []
        out.append({"inputs": _params(args, structs), "name": name,
                    "outputs": outputs, "stateMutability": mut,
                    "type": "function"})
    return out


GETTER_RE = re.compile(
    r"(?:mapping\s*\(\s*(\w+)\s*=>\s*(\w+)\s*\)|(\w+))\s+public\s+"
    r"(?:constant\s+)?(\w+)\s*[=;]")


def _parse_getters(text: str) -> list[dict]:
    out = []
    for m in re.finditer(GETTER_RE, text):
        key, val, simple, name = m.groups()
        if simple in ("returns", "memory"):
            continue
        if key:  # mapping getter
            inputs = [{"internalType": _canon(key), "name": "",
                       "type": _canon(key)}]
            outputs = [{"internalType": _canon(val), "name": "",
                        "type": _canon(val)}]
        else:
            inputs = []
            outputs = [{"internalType": _canon(simple), "name": "",
                        "type": _canon(simple)}]
        out.append({"inputs": inputs, "name": name, "outputs": outputs,
                    "stateMutability": "view", "type": "function"})
    return out


def _parse_events_errors(text: str) -> list[dict]:
    out = []
    for m in re.finditer(r"event\s+(\w+)\s*\(([^)]*)\)", text):
        inputs = []
        for p in m.group(2).split(","):
            toks = p.split()
            if not toks:
                continue
            indexed = "indexed" in toks
            typ = _canon(toks[0])
            inputs.append({"indexed": indexed, "internalType": typ,
                           "name": toks[-1] if len(toks) > 1 else "",
                           "type": typ})
        out.append({"anonymous": False, "inputs": inputs,
                    "name": m.group(1), "type": "event"})
    for m in re.finditer(r"error\s+(\w+)\s*\(([^)]*)\)", text):
        out.append({"inputs": _params(m.group(2), {}), "name": m.group(1),
                    "type": "error"})
    return out


def generate() -> list[dict]:
    abi: list[dict] = []
    seen = set()
    structs: dict = {}
    texts = [_strip(p.read_text()) for p in SOURCES]
    for t in texts:
        structs.update(_parse_structs(t))
    for t in texts:
        for item in _parse_functions(t, structs) + _parse_getters(t):
            key = (item["name"],
                   tuple(i["type"] for i in item.get("inputs", [])))
            if key not in seen:
                seen.add(key)
                abi.append(item)
    abi.extend(_parse_events_errors(_strip(IFACE.read_text())))
    abi.sort(key=lambda e: (e["type"], e["name"]))
    return abi


def main() -> int:
    abi = generate()
    text = json.dumps(abi, indent=2) + "\n"
    if "--check" in sys.argv:
        if not OUT.exists() or OUT.read_text() != text:
            print("abi/VectorX.abi.json is stale — run scripts/abigen.py",
                  file=sys.stderr)
            return 1
        print("abi up to date")
        return 0
    OUT.parent.mkdir(exist_ok=True)
    OUT.write_text(text)
    print(f"wrote {OUT} ({len(abi)} entries)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
