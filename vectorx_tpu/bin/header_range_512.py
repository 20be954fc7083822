"""Circuit entrypoint: header_range with a 512-header commitment tree
(reference bin/header_range_512.rs:14-17)."""

from vectorx_tpu.bin._entrypoint import run_entrypoint
from vectorx_tpu.circuits import HeaderRangeCircuit


def _make(config):
    return HeaderRangeCircuit(
        max_authority_set_size=config.max_authority_set_size,
        max_header_size=config.max_header_size,
        max_num_headers=512)


def _succinct(fetcher, input_bytes, config):
    from vectorx_tpu.circuits.succinct_header_range import \
        prove_header_range_succinct

    return prove_header_range_succinct(fetcher, input_bytes, tree_size=512)


if __name__ == "__main__":
    run_entrypoint("header_range_512", _make, "req_bytes",
                   succinct_prover=_succinct)
