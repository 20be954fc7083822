"""Verifier-VM machine AIR: lowering, proving, and soundness checks."""

import numpy as np
import pytest

from vectorx_tpu.field.goldilocks import P
from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.hash import poseidon_py
from vectorx_tpu.stark import FibonacciAir, StarkConfig, prove, verify
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.shadow import verifier_tape
from vectorx_tpu.recursion.ssa import Builder

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=2,
                                final_poly_len=2, pow_bits=1))


def _toy_tape(witness: bool, x=5, y=7) -> Builder:
    """Exercises every op kind: fresh, fma, multi-term affine, assert,
    duplex, bitdec, public."""
    b = Builder(witness=witness)
    xv = b.fresh((x, 0) if witness else None, "x")
    yv = b.fresh((y, 0) if witness else None, "y")
    p = b.public(5, 0)
    b.assert_eq(p, xv, where="x_is_public")
    z = b.mul(xv, yv)
    w = b.add(z, (3, 0))
    b.assert_zero(b.sub(w, ((x * y + 3) % P, 0)), where="w")
    d1, outs = b.duplex([xv, yv], keep_state=False, prev=-1)
    h0 = poseidon_py.permute([5, 7] + [0] * 10)[0]
    b.assert_eq(outs[0], (h0, 0), where="hash")
    _, outs2 = b.duplex([w], keep_state=True, prev=d1)
    bits = b.bitdec(yv, 8, canonical=False)
    # y == 7: low three bits set
    b.assert_eq(b.add(bits[0], bits[1]), (2, 0), where="bits")
    return b


def test_toy_tape_proves_and_verifies():
    prog = compile_tape(_toy_tape(witness=True))
    air = MachineAir(prog)
    trace = air.build_trace()
    proof = prove(air, trace, CFG)
    assert verify(air, proof, CFG)


def test_program_is_statement_only():
    pw = compile_tape(_toy_tape(witness=True))
    ps = compile_tape(_toy_tape(witness=False))
    aw, as_ = MachineAir(pw), MachineAir(ps)
    assert np.array_equal(aw.constant_columns(), as_.constant_columns())
    assert aw.public_inputs() == as_.public_inputs()
    assert aw.boundaries(aw.public_inputs()) == \
        as_.boundaries(as_.public_inputs())


def test_tampered_trace_rejected():
    prog = compile_tape(_toy_tape(witness=True))
    air = MachineAir(prog)
    trace = air.build_trace()
    # flip a value cell: the fma result of x·y (search a cell equal to 35)
    pos = np.argwhere(trace == np.uint64(35))
    assert pos.size
    r, c = pos[0]
    trace[r, c] = 36
    with pytest.raises(AssertionError):
        # composition polynomial no longer divisible by Z_H
        prove(air, trace, CFG)


def test_wrong_witness_fails_lowering_values():
    # a tape whose asserts fail (x=6 but public pins 5) dies at tape build,
    # before the machine is ever reached
    from vectorx_tpu.recursion.ssa import TapeCheckFailed

    with pytest.raises(TapeCheckFailed):
        _toy_tape(witness=True, x=6)


def test_shadow_tape_on_machine():
    """The flagship: a full STARK verification of a child proof runs as ONE
    machine proof — recursion, aggregation-ready."""
    child = FibonacciAir(log_n=3)
    child_proof = prove(child, child.build_trace(), CFG)
    assert verify(child, child_proof, CFG)

    b = Builder(witness=True)
    verifier_tape(b, child, CFG, proof=child_proof)
    prog = compile_tape(b)
    air = MachineAir(prog)
    trace = air.build_trace()
    outer = prove(air, trace, CFG)
    assert verify(air, outer, CFG)
    # child publics surface as machine publics
    assert air.public_inputs() == child.public_inputs()

    # the program is derivable by the machine VERIFIER from the statement
    bs = Builder(witness=False)
    verifier_tape(bs, child, CFG, proof=None)
    ps = compile_tape(bs)
    assert np.array_equal(MachineAir(ps).constant_columns(),
                          air.constant_columns())
