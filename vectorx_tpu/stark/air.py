"""AIR (algebraic intermediate representation) interface.

An `Air` describes a fixed-shape trace (width × 2^log_n rows), transition
constraints between consecutive rows, and boundary constraints — the same
role plonky2x's circuit + starkyx's AIR co-processors play in the reference
stack (SURVEY.md §2 E1/E3).  Constraints are written once against an abstract
algebra and evaluated twice:

* on-device over the whole LDE domain (base-field uint32-limb arrays,
  vectorized across all 8n points at once), and
* host-side at the single DEEP point ζ in GF(p^2) (Python ints).
"""

from __future__ import annotations

from dataclasses import dataclass

from vectorx_tpu.field import ext_py
from vectorx_tpu.field import extension as ge
from vectorx_tpu.field import goldilocks as gl


class DeviceAlgebra:
    """Elements are (lo, hi) uint32 array pairs (base field, vectorized)."""

    @staticmethod
    def add(a, b):
        return gl.add(a[0], a[1], b[0], b[1])

    @staticmethod
    def sub(a, b):
        return gl.sub(a[0], a[1], b[0], b[1])

    @staticmethod
    def mul(a, b):
        return gl.mul(a[0], a[1], b[0], b[1])

    @staticmethod
    def constant(v: int):
        import jax.numpy as jnp

        v %= gl.P
        return (jnp.uint32(v & 0xFFFFFFFF), jnp.uint32(v >> 32))


class ExtAlgebra:
    """Elements are (c0, c1) Python-int pairs in GF(p^2)."""

    add = staticmethod(ext_py.add)
    sub = staticmethod(ext_py.sub)
    mul = staticmethod(ext_py.mul)

    @staticmethod
    def constant(v: int):
        return ext_py.from_base(v)


@dataclass
class Air:
    width: int
    log_n: int
    constraint_degree: int = 2  # max total degree of any transition constraint

    @property
    def n(self) -> int:
        return 1 << self.log_n

    def public_inputs(self) -> list[int]:
        return []

    def constant_columns(self):
        """Preprocessed columns as a (K, n) uint64 array (round constants,
        selectors, …).  Committed once per AIR ("verification key"), opened
        like witness columns — the role plonky2's constants/sigmas
        commitment plays (SURVEY.md §2 E1).  Default: none."""
        import numpy as np

        return np.zeros((0, self.n), dtype=np.uint64)

    def transition(self, alg, local: list, nxt: list, public: list[int],
                   consts: list | None = None):
        """Constraint values that must vanish on every row but the last.
        `local`/`nxt` are lists of `width` algebra elements; `consts` holds
        the constant columns evaluated on the same row."""
        raise NotImplementedError

    def boundaries(self, public: list[int]):
        """[(row, col, value_int)] equality constraints on trace cells."""
        return []


class FibonacciAir(Air):
    """Toy AIR used by tests and benchmarks: columns (a, b), rows step the
    Fibonacci recurrence; public inputs pin the start and end values."""

    def __init__(self, log_n: int, a0: int = 1, b0: int = 1):
        super().__init__(width=2, log_n=log_n, constraint_degree=2)
        self.a0, self.b0 = a0, b0
        # compute the final value for the boundary
        a, b = a0, b0
        for _ in range(self.n - 1):
            a, b = b, (a + b) % gl.P
        self.final = b

    def public_inputs(self):
        return [self.a0, self.b0, self.final]

    def transition(self, alg, local, nxt, public, consts=None):
        a, b = local
        an, bn = nxt
        return [
            alg.sub(an, b),                    # a' = b
            alg.sub(bn, alg.add(a, b)),        # b' = a + b
        ]

    def boundaries(self, public):
        return [
            (0, 0, public[0]),
            (0, 1, public[1]),
            (self.n - 1, 1, public[2]),
        ]

    def build_trace(self):
        """Generate the witness trace as numpy uint64 (width, n)."""
        import numpy as np

        n = self.n
        tr = np.zeros((2, n), dtype=np.uint64)
        a, b = self.a0, self.b0
        for i in range(n):
            tr[0, i] = a
            tr[1, i] = b
            a, b = b, (a + b) % gl.P
        return tr
