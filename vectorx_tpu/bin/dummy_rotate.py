"""Dummy entrypoint (reference bin/dummy_rotate.rs)."""

from vectorx_tpu.bin._entrypoint import run_entrypoint
from vectorx_tpu.circuits import DummyRotate


def _make(config):
    return DummyRotate()


if __name__ == "__main__":
    run_entrypoint("dummy_rotate", _make, "req_bytes")
