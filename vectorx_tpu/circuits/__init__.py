from vectorx_tpu.circuits.dummy import DummyHeaderRange, DummyRotate
from vectorx_tpu.circuits.header_range import (HeaderRangeCircuit,
                                               RotateCircuit)
from vectorx_tpu.circuits.justification import (JustificationError,
                                                verify_simple_justification)
from vectorx_tpu.circuits.rotate import RotateError
from vectorx_tpu.circuits.subchain import (SubchainError, SubchainOutput,
                                           verify_subchain)

__all__ = [
    "DummyHeaderRange", "DummyRotate", "HeaderRangeCircuit", "RotateCircuit",
    "JustificationError", "verify_simple_justification", "RotateError",
    "SubchainError", "SubchainOutput", "verify_subchain",
]
