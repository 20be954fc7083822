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
* `ssa`       — the op tape: symbolic values, Poseidon duplexes, bit
                decompositions, fused mul-adds, assertions.
* `shadow`    — replays `stark.verifier.verify` onto a tape (program is a
                function of the child statement + config only; a concrete
                proof binds the witness values; publics can be wired).
* `machine`   — the verifier-VM AIR executing a tape: dual-FMA rows,
                packed 9-row Poseidon slots, multi-write rows, and an
                8-port LogUp memory bus.
* `aggregate` — N child proofs -> ONE machine proof; the verifier
                re-derives the program from the child statements.
* `succinct`  — wired-public composition: intermediates hidden from the
                final verifier (leaves+root-only SHA commitment tree).
"""

from vectorx_tpu.recursion.ssa import Builder
from vectorx_tpu.recursion.shadow import verifier_tape
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.aggregate import aggregate_prove, aggregate_verify

__all__ = ["Builder", "verifier_tape", "MachineAir", "compile_tape",
           "aggregate_prove", "aggregate_verify"]
