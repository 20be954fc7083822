"""Dummy entrypoint (reference bin/dummy_header_range_256.rs)."""

from vectorx_tpu.bin._entrypoint import run_entrypoint
from vectorx_tpu.circuits import DummyHeaderRange


def _make(config):
    return DummyHeaderRange(256)


if __name__ == "__main__":
    run_entrypoint("dummy_header_range_256", _make, "req_bytes")
