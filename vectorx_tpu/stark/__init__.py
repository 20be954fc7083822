from vectorx_tpu.stark.air import (Air, DeviceAlgebra, ExtAlgebra,
                                   FibonacciAir, Lookup)
from vectorx_tpu.stark.prover import StarkConfig, StarkProof, preprocess, prove
from vectorx_tpu.stark.verifier import verify

__all__ = ["Air", "DeviceAlgebra", "ExtAlgebra", "FibonacciAir", "Lookup",
           "StarkConfig", "StarkProof", "preprocess", "prove", "verify"]


def __getattr__(name):
    # Lazy AIR exports (their modules pull in the full kernel stack)
    if name == "PoseidonAir":
        from vectorx_tpu.stark.poseidon_air import PoseidonAir
        return PoseidonAir
    if name == "Sha256Air":
        from vectorx_tpu.stark.sha256_air import Sha256Air
        return Sha256Air
    if name == "Blake2bAir":
        from vectorx_tpu.stark.blake2b_air import Blake2bAir
        return Blake2bAir
    if name == "FpMulAir":
        from vectorx_tpu.stark.ed25519_air import FpMulAir
        return FpMulAir
    if name == "RangeCheckAir":
        from vectorx_tpu.stark.range_air import RangeCheckAir
        return RangeCheckAir
    raise AttributeError(name)
