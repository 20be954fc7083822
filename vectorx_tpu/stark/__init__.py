from vectorx_tpu.stark.air import Air, DeviceAlgebra, ExtAlgebra, FibonacciAir
from vectorx_tpu.stark.prover import StarkConfig, StarkProof, prove
from vectorx_tpu.stark.verifier import verify

__all__ = ["Air", "DeviceAlgebra", "ExtAlgebra", "FibonacciAir",
           "StarkConfig", "StarkProof", "prove", "verify"]
