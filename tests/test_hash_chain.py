"""Succinct hash chain: hidden header bytes, public (trusted, final) only.

Fast structural tests here; the full machine prove is evidence-driven
(evidence/drive_hash_chain.py -> evidence/hash_chain.json)."""

import hashlib
import os

import numpy as np
import pytest

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark.blake2b_air import Blake2bAir
from vectorx_tpu.stark.prover import StarkConfig, prove
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.ssa import Builder, TapeCheckFailed
from vectorx_tpu.recursion.succinct import _chain_tape

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=2,
                                final_poly_len=2, pow_bits=1))
H0 = b"\xAA" * 32 + b"payload-zero" * 3
H1 = hashlib.blake2b(H0, digest_size=32).digest() + b"payload-one" * 3
HEADERS = [H0, H1]
TRUSTED = H0[:32]
FINAL = hashlib.blake2b(H1, digest_size=32).digest()
LENS = [len(h) for h in HEADERS]


def _child():
    air = Blake2bAir(HEADERS, bind="public")
    return prove(air, air.build_trace(), CFG)


CHILD = _child()


def test_chain_tape_accepts_and_is_statement_only():
    bw = Builder(witness=True)
    _chain_tape(bw, LENS, TRUSTED, FINAL, CFG, CHILD, HEADERS)
    bs = Builder(witness=False)
    _chain_tape(bs, LENS, TRUSTED, FINAL, CFG, None, None)
    aw, as_ = MachineAir(compile_tape(bw)), MachineAir(compile_tape(bs))
    assert np.array_equal(aw.constant_columns(), as_.constant_columns())
    # the verifier's surface: 8 + 8 hash limbs, nothing else
    assert aw.public_inputs() == as_.public_inputs()
    assert len(aw.public_inputs()) == 16


def test_chain_tape_rejects_wrong_link():
    # headers that do NOT link: the tape (child transcript) must reject
    bad_h1 = b"\x13" * 32 + b"payload-one" * 3
    bad_headers = [H0, bad_h1]
    air = Blake2bAir(bad_headers, bind="public")
    bad_child = prove(air, air.build_trace(), CFG)
    b = Builder(witness=True)
    with pytest.raises((TapeCheckFailed, AssertionError, KeyError)):
        # the wired parent-hash handle diverges from what bad_child proved
        _chain_tape(b, LENS, TRUSTED, FINAL, CFG, bad_child, bad_headers)


@pytest.mark.skipif(os.environ.get("VECTORX_SLOW_TESTS", "0") != "1",
                    reason="machine prove is ~30 min on CPU; see "
                           "evidence/hash_chain.json")
def test_hash_chain_full_roundtrip():
    from vectorx_tpu.recursion.succinct import (prove_hash_chain,
                                                verify_hash_chain)

    chain = prove_hash_chain(HEADERS, CFG)
    assert verify_hash_chain(TRUSTED, FINAL, chain, CFG)
    assert not verify_hash_chain(TRUSTED, b"\x00" * 32, chain, CFG)
