"""VK-cache token fast path (stark/vk.py + recursion/progcache.py).

A program fetched through the progcache carries its content-address key;
MachineAir exposes it as `vk_token()`, and `constants_cap` serves a warm
verify from the token WITHOUT materializing the constant columns (an O(n)
host build + content hash at flagship scale).  These tests lock:

* token-path cap == content-path cap (same derivation, two keys);
* a warm-VK verify of a token-carrying program never touches
  `constant_columns` (the gateway steady-state / tamper-rejection path);
* a program WITHOUT a token still verifies through the content path.
"""

from dataclasses import replace

import pytest

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.recursion import progcache
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark import vk

from test_recursion_machine import _toy_tape

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=2,
                                final_poly_len=2, pow_bits=1))


@pytest.fixture()
def isolated_caches(tmp_path, monkeypatch):
    monkeypatch.setenv("VECTORX_VK_CACHE", str(tmp_path))
    vk.clear_memory_cache()
    progcache.clear_memory_cache()
    yield
    vk.clear_memory_cache()
    progcache.clear_memory_cache()


def _keyed_program():
    prog = compile_tape(_toy_tape(witness=True))
    key = progcache.digest_key("vk-token-test", prog.n_rows)
    progcache.put(key, prog)   # sets _stmt_key on the caller's program
    return prog, key


def test_token_cap_matches_content_cap(isolated_caches):
    prog, _ = _keyed_program()
    air = MachineAir(prog)
    assert air.vk_token() is not None
    cap_via_token_seed = vk.constants_cap(air, CFG)  # derives, seeds both

    # a fresh air over an unkeyed copy of the same program must hit the
    # CONTENT key and agree
    bare = replace(prog)     # drops ad-hoc attrs, including _stmt_key
    air2 = MachineAir(bare)
    assert air2.vk_token() is None
    assert vk.constants_cap(air2, CFG) == cap_via_token_seed


def test_warm_verify_never_builds_constant_columns(isolated_caches):
    prog, key = _keyed_program()
    air = MachineAir(prog)
    trace = air.build_trace()
    proof = prove(air, trace, CFG)
    assert verify(air, proof, CFG)   # seeds the VK cache (token + content)

    # gateway steady state: fresh process-equivalent — program re-fetched
    # from the cache, columns never built
    fetched = progcache.get(key)[0]
    cold_air = MachineAir(fetched)

    def boom():
        raise AssertionError("constant_columns materialized on warm verify")

    cold_air.constant_columns = boom
    assert cold_air.num_constants() == air.num_constants()
    assert verify(cold_air, proof, CFG)


def test_unkeyed_program_still_verifies(isolated_caches):
    prog = compile_tape(_toy_tape(witness=True))
    air = MachineAir(prog)
    proof = prove(air, air.build_trace(), CFG)
    assert air.vk_token() is None
    assert verify(air, proof, CFG)
