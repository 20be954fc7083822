#!/bin/bash
# Regenerate abi/VectorX.abi.json.
#
# Reference-parity with scripts/abigen.sh (reference scripts/abigen.sh:1-24):
# with forge available, extract the ABI from the real build output; without
# it (this repo's build environment ships no Solidity toolchain), fall back
# to the hermetic source parser.  CI runs the forge path and diffs against
# the committed file (scripts/abicheck.py).
set -euo pipefail
cd "$(dirname "$0")/.."

mkdir -p abi
if command -v forge >/dev/null 2>&1; then
  (cd contracts && forge clean && forge build)
  python3 -c "import json; print(json.dumps(json.load(open('contracts/out/VectorX.sol/VectorX.json'))['abi'], indent=2))" > abi/VectorX.abi.json
else
  python3 scripts/abigen.py
fi
