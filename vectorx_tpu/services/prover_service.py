"""Prover service (E5 replacement).

Where the reference posts requests to the closed Succinct platform
(`SuccinctClient.submit_platform_request`, /root/reference/bin/vectorx.rs:
122-130) which runs the circuit binaries, this service registers this
repo's own circuit pipelines as the gateway's provers: every
request_call is fulfilled by actually executing header_range / rotate
against the chain data source.
"""

from __future__ import annotations

from vectorx_tpu.circuits import HeaderRangeCircuit, RotateCircuit
from vectorx_tpu.services.contract import MockGateway


def make_gateway(fetcher, max_authority_set_size: int = 300,
                 max_num_headers: int = 256,
                 max_header_size: int = 35840,
                 header_range_function_id: bytes = b"\x01" * 32,
                 rotate_function_id: bytes = b"\x02" * 32,
                 dummy: bool = False) -> MockGateway:
    """Gateway whose provers run the real (or dummy) circuit pipelines."""
    gw = MockGateway()
    if dummy:
        from vectorx_tpu.circuits import DummyHeaderRange, DummyRotate

        hr = DummyHeaderRange(max_num_headers)
        rt = DummyRotate()
    else:
        hr = HeaderRangeCircuit(
            max_authority_set_size=max_authority_set_size,
            max_header_size=max_header_size,
            max_num_headers=max_num_headers)
        rt = RotateCircuit(max_authority_set_size=max_authority_set_size,
                           max_header_size=max_header_size)
    gw.register_prover(header_range_function_id,
                       lambda inp: hr.run(inp, fetcher))
    gw.register_prover(rotate_function_id, lambda inp: rt.run(inp, fetcher))
    return gw
