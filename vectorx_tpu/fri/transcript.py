"""Fiat-Shamir transcript ("challenger") over the Poseidon duplex sponge.

Host-side (Python ints): the transcript is a tiny sequential state threaded
between the big batched device computations, so bigint math beats device
round-trips.  Semantics mirror plonky2's `Challenger` (SURVEY.md §2 E1):
observed elements fill the rate lanes; a duplex (overwrite + permute) runs
whenever a challenge is requested with pending inputs or an empty output
buffer.  Deterministic across hosts — every worker in a multi-host proof
derives identical challenges from identical observations (SURVEY.md §7
hard part 7).
"""

from __future__ import annotations

from vectorx_tpu.field.goldilocks import P
from vectorx_tpu.hash import poseidon as pv
from vectorx_tpu.hash import poseidon_py


class Challenger:
    def __init__(self):
        self.state = [0] * pv.WIDTH
        self.input_buf: list[int] = []
        self.output_buf: list[int] = []

    def copy(self) -> "Challenger":
        c = Challenger()
        c.state = list(self.state)
        c.input_buf = list(self.input_buf)
        c.output_buf = list(self.output_buf)
        return c

    def observe(self, element: int) -> None:
        self.output_buf = []
        self.input_buf.append(element % P)
        if len(self.input_buf) == pv.RATE:
            self._duplex()

    def observe_many(self, elements) -> None:
        for e in elements:
            self.observe(int(e))

    def observe_digest(self, digest: list[int]) -> None:
        self.observe_many(digest)

    def observe_cap(self, cap: list[list[int]]) -> None:
        for d in cap:
            self.observe_digest(d)

    def observe_bytes32(self, data: bytes) -> None:
        """Absorb 32 bytes as four u64 limbs (big-endian)."""
        assert len(data) == 32
        for i in range(0, 32, 8):
            self.observe(int.from_bytes(data[i:i + 8], "big") % P)

    def _duplex(self) -> None:
        for i, x in enumerate(self.input_buf):
            self.state[i] = x
        self.input_buf = []
        self.state = poseidon_py.permute(self.state)
        self.output_buf = list(self.state[: pv.RATE])

    def get_challenge(self) -> int:
        if self.input_buf or not self.output_buf:
            self._duplex()
        return self.output_buf.pop()

    def get_n_challenges(self, n: int) -> list[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self) -> tuple[int, int]:
        return self.get_challenge(), self.get_challenge()
