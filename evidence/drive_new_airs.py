"""Verify drive: SHA-512 AIR + ed25519 ladder AIR through the public
package boundary — prove, verify, and statement-tamper rejection."""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
from vectorx_tpu.jaxcache import enable_persistent_cache
enable_persistent_cache()

from vectorx_tpu.fri.fri import FriConfig
from vectorx_tpu.stark import StarkConfig, prove, verify
from vectorx_tpu.stark.sha512_air import Sha512Air
from vectorx_tpu.stark.ed25519_ladder_air import Ed25519LadderAir
from vectorx_tpu.curves import ed25519 as ed

CFG = StarkConfig(fri=FriConfig(rate_bits=3, cap_height=0, num_queries=12,
                                final_poly_len=4, pow_bits=0))

# --- SHA-512 AIR: two messages, digests vs hashlib, tamper rejection ---
msgs = [b"vectorx sha512 drive", b"x" * 111]
want = [hashlib.sha512(m).digest() for m in msgs]
pair = Sha512Air(msgs)
assert pair.digest_bytes_list() == want, "sha512 witness != hashlib"
t0 = time.time()
proof = prove(pair, pair.build_trace(), CFG)
t1 = time.time()
air = Sha512Air.statement(msgs, want)
assert verify(air, proof, CFG), "sha512 verify failed"
bad = bytearray(want[0]); bad[0] ^= 1
air_bad = Sha512Air.statement(msgs, [bytes(bad), want[1]])
assert not verify(air_bad, proof, CFG), "sha512 tamper accepted"
print(f"sha512-air: 2 msgs proven in {t1-t0:.1f}s, verified, tamper rejected")

# --- ed25519 ladder AIR: toy scalar round-trip + tamper ---
def _neg(p):
    return ((ed.Q - p[0]) % ed.Q, p[1], p[2], (ed.Q - p[3]) % ed.Q)

A_pt = ed.scalar_mult(99991, ed.B_POINT)
sb = ed.scalar_mult(201, ed.B_POINT)
ha = ed.scalar_mult(77, A_pt)
r_pt = ed.point_add(sb, _neg(ha))
sig = (ed.point_compress(A_pt), ed.point_compress(r_pt), 201, 77)
lair = Ed25519LadderAir([sig], nbits=8)
t0 = time.time()
lproof = prove(lair, lair.build_trace(), CFG)
t1 = time.time()
assert verify(lair, lproof, CFG), "ladder verify failed"
bad_sig = (sig[0], sig[1], 202, 77)
lair_bad = Ed25519LadderAir([bad_sig], nbits=8)
assert not verify(lair_bad, lproof, CFG), "ladder tamper accepted"
print(f"ed25519-ladder-air: 8-bit instance proven in {t1-t0:.1f}s, "
      "verified, statement tamper rejected")
print("DRIVE-OK")
