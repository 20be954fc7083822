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

    # Below this many elements, host bigint permutes beat a device dispatch
    # (one axon-tunnel round trip ≈ tens of host permutes).
    BULK_MIN = 512

    def observe_many(self, elements) -> None:
        elems = [int(e) for e in elements]
        if len(elems) < self.BULK_MIN:
            for e in elems:
                self.observe(e)
            return
        self._observe_bulk(elems)

    def _observe_bulk(self, elems: list[int]) -> None:
        """Protocol-identical to element-wise observe: fill the current
        partial rate buffer on the host, run every full-rate duplex as ONE
        device scan (`poseidon.absorb_blocks`), keep the tail buffered."""
        import numpy as np

        head = (-len(self.input_buf)) % pv.RATE
        for e in elems[:head]:
            self.observe(e)
        rest = elems[head:]
        nfull = len(rest) // pv.RATE
        if nfull == 0:
            for e in rest:
                self.observe(e)
            return
        arr = np.array(rest[: nfull * pv.RATE], dtype=np.uint64)
        arr %= np.uint64(P)
        blocks = arr.reshape(nfull, pv.RATE)
        # pad the scan length to a pow2 bucket so one compile serves all sizes
        m_pad = 1 << max(0, (nfull - 1)).bit_length()
        pad = np.zeros((m_pad - nfull, pv.RATE), dtype=np.uint64)
        blocks = np.concatenate([blocks, pad], axis=0)
        from vectorx_tpu.field import goldilocks as gl

        xl, xh = gl.from_u64(blocks)
        st = np.array(self.state, dtype=np.uint64)
        s_l, s_h = gl.from_u64(st)
        sl, sh = pv.absorb_blocks(s_l, s_h, xl, xh, np.uint32(nfull))
        sl = np.asarray(sl, dtype=np.uint64)
        sh = np.asarray(sh, dtype=np.uint64)
        self.state = [int(l | (h << 32)) for l, h in zip(sl, sh)]
        self.input_buf = []
        self.output_buf = list(self.state[: pv.RATE])
        tail = rest[nfull * pv.RATE:]
        for e in tail:
            self.observe(e)

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
