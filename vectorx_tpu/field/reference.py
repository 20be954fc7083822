"""Pure-Python integer model of the Goldilocks field, used as a test oracle.

Mirrors the semantics of the TPU limb kernels in
`vectorx_tpu.field.goldilocks` (which themselves mirror the reference stack's
plonky2 `GoldilocksField` — see SURVEY.md §2 E1).
"""

from __future__ import annotations

P = (1 << 64) - (1 << 32) + 1


def add(a: int, b: int) -> int:
    return (a + b) % P


def sub(a: int, b: int) -> int:
    return (a - b) % P


def mul(a: int, b: int) -> int:
    return (a * b) % P


def inv(a: int) -> int:
    if a % P == 0:
        return 0
    return pow(a, P - 2, P)


def exp(a: int, e: int) -> int:
    return pow(a, e, P)
