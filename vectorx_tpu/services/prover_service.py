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
                 dummy: bool = False, zk: bool = False,
                 stark_config=None) -> MockGateway:
    """Gateway whose provers run the real (or dummy) circuit pipelines.

    With `zk=True` the header_range prover returns `(output, ZK proof)`
    and the gateway VERIFIES the proof before the contract callback — the
    reference's `verifiedCall` trust boundary
    (/root/reference/contracts/src/VectorX.sol:259-262).  Tampering the
    prover output makes the fulfillment revert (exercised by the system
    tests).

    With `zk="succinct"` BOTH functions run the round-3 product pipeline:
    ONE machine proof each, hidden header bytes, in-ZK signatures — the
    gateway verifier sees only (input, output, proof)
    (circuits/succinct_header_range.py, circuits/succinct_rotate.py)."""
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
    if zk == "succinct":
        from vectorx_tpu.circuits.succinct_header_range import (
            prove_header_range_succinct, verify_header_range_succinct)
        from vectorx_tpu.circuits.succinct_rotate import (
            prove_rotate_succinct, verify_rotate_succinct)
        from vectorx_tpu.stark.prover import StarkConfig

        cfg = stark_config or StarkConfig()

        def shr_prove(inp):
            p = prove_header_range_succinct(fetcher, inp,
                                            tree_size=max_num_headers,
                                            config=cfg)
            return p.output_bytes, p

        def shr_verify(inp, output, p) -> bool:
            if p is None or getattr(p, "input_bytes", None) != inp or \
                    getattr(p, "output_bytes", None) != output:
                return False
            return verify_header_range_succinct(p, config=cfg)

        def srt_prove(inp):
            p = prove_rotate_succinct(
                fetcher, inp, max_authorities=max_authority_set_size,
                config=cfg)
            return p.output_bytes, p

        def srt_verify(inp, output, p) -> bool:
            if p is None or getattr(p, "input_bytes", None) != inp or \
                    getattr(p, "output_bytes", None) != output:
                return False
            return verify_rotate_succinct(
                p, max_authorities=max_authority_set_size, config=cfg)

        gw.register_prover(header_range_function_id, shr_prove, shr_verify)
        gw.register_prover(rotate_function_id, srt_prove, srt_verify)
        return gw
    if zk:
        from vectorx_tpu.circuits.zk_header_range import (
            prove_header_range_zk, verify_header_range_zk)
        from vectorx_tpu.stark.prover import StarkConfig

        cfg = stark_config or StarkConfig()

        def hr_prove(inp):
            zkp = prove_header_range_zk(
                fetcher, inp, tree_size=max_num_headers,
                max_authorities=max_authority_set_size, config=cfg)
            return zkp.output_bytes, zkp

        def hr_verify(inp, output, zkp) -> bool:
            if zkp is None or getattr(zkp, "input_bytes", None) != inp or \
                    getattr(zkp, "output_bytes", None) != output:
                return False
            try:
                return verify_header_range_zk(zkp, tree_size=max_num_headers,
                                              config=cfg)
            except Exception:
                return False

        gw.register_prover(header_range_function_id, hr_prove, hr_verify)
    else:
        gw.register_prover(header_range_function_id,
                           lambda inp: hr.run(inp, fetcher))
    gw.register_prover(rotate_function_id, lambda inp: rt.run(inp, fetcher))
    return gw
