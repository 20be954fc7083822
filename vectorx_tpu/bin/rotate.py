"""Circuit entrypoint: rotate (reference bin/rotate.rs:13-15)."""

from vectorx_tpu.bin._entrypoint import run_entrypoint
from vectorx_tpu.circuits import RotateCircuit


def _make(config):
    return RotateCircuit(
        max_authority_set_size=config.max_authority_set_size,
        max_header_size=config.max_header_size)


def _succinct(fetcher, input_bytes, config):
    from vectorx_tpu.circuits.succinct_rotate import prove_rotate_succinct

    return prove_rotate_succinct(
        fetcher, input_bytes,
        max_authorities=config.max_authority_set_size)


if __name__ == "__main__":
    run_entrypoint("rotate", _make, "req_bytes", succinct_prover=_succinct)
