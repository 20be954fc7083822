from vectorx_tpu.hash import poseidon, poseidon_py

__all__ = ["poseidon", "poseidon_py"]
