"""Recorded-response replay tests for the live Avail RPC backend.

The reference's RpcDataFetcher is only tested against a live node
(/root/reference/circuits/input/mod.rs:971-1236); here the JSON-RPC
transport is replayed from recorded-format responses so the full parsing
path (hex framing, SCALE authority decode, storage reads, binary search,
retry discipline) runs hermetically with zero egress."""

import json

import pytest

from vectorx_tpu import scale
from vectorx_tpu.io.avail_rpc import AvailRpcFetcher, RpcError


class _Resp:
    def __init__(self, payload: dict):
        self._data = json.dumps(payload).encode()

    def read(self):
        return self._data

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Replay:
    """urlopen stand-in: serves recorded results keyed by (method, params),
    optionally failing the first N calls to exercise the retry loop."""

    def __init__(self, recorded, fail_first: int = 0):
        self.recorded = recorded
        self.fail_first = fail_first
        self.calls = []

    def __call__(self, req, timeout=None):
        body = json.loads(req.data)
        self.calls.append((body["method"], tuple(body["params"])))
        if self.fail_first > 0:
            self.fail_first -= 1
            raise OSError("connection reset (replayed failure)")
        key = (body["method"], tuple(json.dumps(p) for p in body["params"]))
        if key not in self.recorded:
            raise AssertionError(f"unrecorded RPC call: {key}")
        return _Resp({"jsonrpc": "2.0", "id": body["id"],
                      "result": self.recorded[key]})


def _key(method, params):
    return (method, tuple(json.dumps(p) for p in params))


PUBKEYS = [bytes([i + 1]) * 32 for i in range(3)]


def _authorities_scale(pubkeys, weight=1):
    out = scale.compact_encode(len(pubkeys))
    for pk in pubkeys:
        out += pk + int(weight).to_bytes(8, "little")
    return "0x" + out.hex()


def _fetcher(monkeypatch, recorded, fail_first=0):
    replay = _Replay(recorded, fail_first=fail_first)
    monkeypatch.setattr("vectorx_tpu.io.avail_rpc.urllib.request.urlopen",
                        replay)
    monkeypatch.setattr(AvailRpcFetcher, "RETRY_DELAY_S", 0.0)
    f = AvailRpcFetcher("wss://node.example/ws")
    assert f.url.startswith("https://")
    return f, replay


def test_block_hash_header_and_finalized_head(monkeypatch):
    h7 = "0x" + (b"\xab" * 32).hex()
    header = {"number": "0x7", "parentHash": "0x" + "00" * 32,
              "stateRoot": "0x" + "11" * 32}
    recorded = {
        _key("chain_getBlockHash", [7]): h7,
        _key("chain_getHeader", [h7]): header,
        _key("chain_getFinalizedHead", []): h7,
    }
    f, _ = _fetcher(monkeypatch, recorded)
    assert f.get_block_hash(7) == b"\xab" * 32
    assert f.get_header_json(b"\xab" * 32)["number"] == "0x7"
    assert f.get_finalized_head_hash() == b"\xab" * 32
    assert f.get_head().block_number == 7


def test_authorities_scale_decode_and_set_hash(monkeypatch):
    from vectorx_tpu.hash.sha256 import chained_hash

    h9 = "0x" + (b"\xcd" * 32).hex()
    recorded = {
        _key("chain_getBlockHash", [9]): h9,
        _key("state_call",
             ["GrandpaApi_grandpa_authorities", "0x", h9]):
            _authorities_scale(PUBKEYS),
    }
    f, _ = _fetcher(monkeypatch, recorded)
    assert f.get_authorities(9) == PUBKEYS
    # one more recorded hit for the second get_block_hash round-trip
    assert f.compute_authority_set_hash(9) == chained_hash(PUBKEYS)


def test_non_unit_weight_rejected(monkeypatch):
    h9 = "0x" + (b"\xcd" * 32).hex()
    recorded = {
        _key("chain_getBlockHash", [9]): h9,
        _key("state_call",
             ["GrandpaApi_grandpa_authorities", "0x", h9]):
            _authorities_scale(PUBKEYS, weight=2),
    }
    f, _ = _fetcher(monkeypatch, recorded)
    with pytest.raises(AssertionError, match="weight"):
        f.get_authorities(9)


def test_authority_set_id_storage_read(monkeypatch):
    h5 = "0x" + (b"\x05" * 32).hex()
    recorded = {
        _key("chain_getBlockHash", [5]): h5,
        _key("state_getStorage",
             [AvailRpcFetcher.GRANDPA_CURRENT_SET_ID_KEY, h5]):
            "0x" + (42).to_bytes(8, "little").hex(),
    }
    f, _ = _fetcher(monkeypatch, recorded)
    assert f.get_authority_set_id(5) == 42


def test_last_justified_block_binary_search(monkeypatch):
    """Set id flips 7 -> 8 at block 13: last_justified_block(7) == 13
    (the reference's binary search, input/mod.rs:417-451)."""
    head = 20

    def set_id_at(n):
        return 7 if n < 13 else 8

    recorded = {}
    hh = "0x" + (b"\xee" * 32).hex()
    recorded[_key("chain_getFinalizedHead", [])] = hh
    recorded[_key("chain_getHeader", [hh])] = {"number": hex(head)}
    for n in range(head + 1):
        bh = "0x" + n.to_bytes(1, "big").hex().rjust(64, "0")
        recorded[_key("chain_getBlockHash", [n])] = bh
        recorded[_key("state_getStorage",
                      [AvailRpcFetcher.GRANDPA_CURRENT_SET_ID_KEY, bh])] = \
            "0x" + set_id_at(n).to_bytes(8, "little").hex()
    f, replay = _fetcher(monkeypatch, recorded)
    assert f.last_justified_block(7) == 13
    # binary search, not a scan: O(log head) block-hash lookups
    n_hash_calls = sum(1 for m, _ in replay.calls
                       if m == "chain_getBlockHash")
    assert n_hash_calls <= 16


def test_retry_then_success_and_exhaustion(monkeypatch):
    h7 = "0x" + (b"\xab" * 32).hex()
    recorded = {_key("chain_getBlockHash", [7]): h7}
    f, replay = _fetcher(monkeypatch, recorded, fail_first=2)
    # 2 failures then success — within the 3-attempt budget
    assert f.get_block_hash(7) == b"\xab" * 32
    assert len(replay.calls) == 3
    f2, _ = _fetcher(monkeypatch, recorded, fail_first=3)
    with pytest.raises(RpcError, match="failed after retries"):
        f2.get_block_hash(7)


def test_rpc_error_payload_raises(monkeypatch):
    class _ErrReplay:
        def __call__(self, req, timeout=None):
            body = json.loads(req.data)
            return _Resp({"jsonrpc": "2.0", "id": body["id"],
                          "error": {"code": -32601, "message": "nope"}})

    monkeypatch.setattr("vectorx_tpu.io.avail_rpc.urllib.request.urlopen",
                        _ErrReplay())
    monkeypatch.setattr(AvailRpcFetcher, "RETRY_DELAY_S", 0.0)
    f = AvailRpcFetcher("http://node.example")
    with pytest.raises(RpcError):
        f.get_block_hash(7)
