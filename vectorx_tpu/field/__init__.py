from vectorx_tpu.field import goldilocks, reference
from vectorx_tpu.field.goldilocks import P

__all__ = ["goldilocks", "reference", "P"]
