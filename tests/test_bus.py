"""STARK-core memory bus (BusPort): values written once with multiplicity
k must be read exactly k times with the identical value — the copy-
constraint mechanism the recursive verifier AIR uses in place of plonky2's
wiring permutation."""

import numpy as np
import pytest

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.air import Air, BusPort

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))

X = (123456789, 987654321)
Y = (42, 7)


class BusAir(Air):
    """Width 4 (two ext value pairs); port 0 on cols (0,1), port 1 on
    cols (2,3).  Value X is written once (fanout 2) and read twice at
    distant rows; Y written once, read once."""

    WRITES = {5: (1, X, 2), 40: (2, Y, 1)}      # row -> (addr, val, fanout)
    READS = {20: (1, X), 30: (1, X), 50: (2, Y)}

    def __init__(self, corrupt_row=None, corrupt_addr=None):
        super().__init__(width=4, log_n=6, constraint_degree=2)
        self.corrupt_row = corrupt_row
        self.corrupt_addr = corrupt_addr

    def bus_ports(self):
        return [BusPort(value_cols=(0, 1), addr_col=0, mult_col=1),
                BusPort(value_cols=(2, 3), addr_col=2, mult_col=3)]

    def constant_columns(self):
        cols = np.zeros((4, self.n), dtype=np.uint64)
        for row, (addr, _v, fanout) in self.WRITES.items():
            cols[0, row] = addr
            cols[1, row] = fanout
        for row, (addr, _v) in self.READS.items():
            cols[2, row] = addr
            cols[3, row] = gl.P - 1           # multiplicity −1
        if self.corrupt_addr is not None:
            cols[2, self.corrupt_addr] = 3    # read from an unwritten addr
        return cols

    def transition(self, alg, local, nxt, public, consts=None):
        return []

    def build_trace(self):
        tr = np.zeros((4, self.n), dtype=np.uint64)
        for row, (_a, (v0, v1), _f) in self.WRITES.items():
            tr[0, row + 1], tr[1, row + 1] = v0, v1
        for row, (_a, (v0, v1)) in self.READS.items():
            tr[2, row + 1], tr[3, row + 1] = v0, v1
        if self.corrupt_row is not None:
            tr[2, self.corrupt_row + 1] ^= 1
        return tr


def test_bus_roundtrip():
    air = BusAir()
    proof = prove(air, air.build_trace(), CFG)
    assert verify(air, proof, CFG)


def test_bus_read_of_tampered_value_rejected():
    air = BusAir(corrupt_row=20)
    with pytest.raises(AssertionError):
        prove(air, air.build_trace(), CFG)


def test_bus_read_of_unwritten_address_rejected():
    air = BusAir(corrupt_addr=30)
    with pytest.raises(AssertionError):
        prove(air, air.build_trace(), CFG)


def test_bus_proof_not_transferable():
    air = BusAir()
    proof = prove(air, air.build_trace(), CFG)
    other = BusAir(corrupt_addr=30)   # different preprocessed commitment
    assert not verify(other, proof, CFG)
