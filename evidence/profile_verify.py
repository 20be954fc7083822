"""Profile the host verifier on a production-FRI machine proof.

Builds a small inner STARK, shadows its verification into a tape, compiles
the tape to the verifier-VM machine AIR, proves it on the live backend at
production FRI (28q/16pow), then cProfiles `verify` to find where
gateway-side seconds go.  Not part of the test tier.
"""
import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vectorx_tpu.jaxcache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

from vectorx_tpu.fri.fri import FriConfig  # noqa: E402
from vectorx_tpu.stark import FibonacciAir, StarkConfig, prove, verify
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.shadow import verifier_tape

PROD = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1, num_queries=28,
                                 final_poly_len=4, pow_bits=16))

inner_cfg = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=1,
                                      num_queries=8, final_poly_len=4,
                                      pow_bits=4))
inner = FibonacciAir(log_n=8)
t0 = time.time()
inner_proof = prove(inner, inner.build_trace(), inner_cfg)
print(f"inner prove {time.time()-t0:.1f}s")
from vectorx_tpu.recursion.ssa import Builder  # noqa: E402
tape = Builder(witness=True)
verifier_tape(tape, inner, inner_cfg, proof=inner_proof)
prog = compile_tape(tape)
air = MachineAir(prog)
print(f"machine air: log_n={air.log_n} width={air.width} "
      f"K={air.constant_columns().shape[0]}")
trace = air.build_trace()
t0 = time.time()
proof = prove(air, trace, PROD)
print(f"machine prove {time.time()-t0:.1f}s")

t0 = time.time()
ok = verify(air, proof, PROD)
print(f"verify(warm-vk) {time.time()-t0:.2f}s ok={ok}")

pr = cProfile.Profile()
pr.enable()
ok = verify(air, proof, PROD)
pr.disable()
assert ok
s = io.StringIO()
pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28)
print(s.getvalue())
