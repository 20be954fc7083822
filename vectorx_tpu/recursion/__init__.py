"""Recursive proof aggregation — the TPU-native answer to the reference's
plonky2x map-reduce recursion (`MapReduceGenerator`,
/root/reference/circuits/header_range.rs:71-88, and in-circuit child-proof
verification, /root/reference/circuits/builder/subchain_verification.rs:233-289).

Where the reference proves a log-depth tree of CPU proofs (each reduce node
recursively verifying two children), this package replays the STARK
verifier of MANY child proofs inside ONE wide batched trace — a
row-programmed "verifier VM" whose hot constraint paths are big stacked
device ops.  One aggregation proof replaces the reference's whole tree.

Modules:
* `ssa`     — the op tape: symbolic values, Poseidon duplexes, bit
              decompositions, fused mul-adds, assertions.
* `shadow`  — replays `stark.verifier.verify` onto a tape (program is a
              function of the child statement + config only; a concrete
              proof binds the witness values).
* `machine` — the verifier-VM AIR executing a tape: register file +
              Poseidon rounds + routed mul-add slots + LogUp memory bus.
* `aggregate` — multi-child aggregation with cross-child wiring.
"""

from vectorx_tpu.recursion.ssa import Builder
