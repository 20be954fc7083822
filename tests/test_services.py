"""Full-system tests: chain → genesis → contract → operator → gateway
(circuit provers) → contract state advances across epoch boundaries; plus
indexer, events indexer, store, keccak, fill_block_range."""

import pytest

from vectorx_tpu.io.fixtures import FixtureChain
from vectorx_tpu.io.keccak import keccak256
from vectorx_tpu.io.store import JustificationStore, StoredJustificationData
from vectorx_tpu.services import (EventsIndexer, JustificationIndexer,
                                  OperatorConfig, VectorXOperator,
                                  apply_fill, compute_fill, compute_genesis,
                                  make_gateway, range_key)
from vectorx_tpu.services.contract import VectorXContract

EPOCH = 20
CHAIN = FixtureChain(seed=9, num_blocks=75, epoch_length=EPOCH,
                     authorities_per_era=lambda e: 4)


def make_system(genesis_block=4, tree_size=16, interval=10):
    gw = make_gateway(CHAIN, max_authority_set_size=8,
                      max_num_headers=tree_size)
    g = compute_genesis(CHAIN, genesis_block)
    contract = VectorXContract(
        gw, g.height, g.header_hash, g.authority_set_id,
        g.authority_set_hash, header_range_commitment_tree_size=tree_size)
    op = VectorXOperator(contract, CHAIN, OperatorConfig(
        update_delay_blocks=interval))
    return gw, contract, op


def drain(gw):
    n = 0
    while gw.pending:
        gw.fulfill_next()
        n += 1
    return n


def test_keccak256_known_vectors():
    assert keccak256(b"").hex() == \
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    assert keccak256(b"abc").hex() == \
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"


def test_operator_advances_contract_through_epochs():
    gw, contract, op = make_system()
    # loop until the contract catches up with the chain head
    for _ in range(30):
        op.run_once()
        drain(gw)
        if contract.latest_block >= 70:
            break
    assert contract.latest_block >= 70
    # crossed epochs 1,2,3 → rotations stored
    assert 1 in contract.authority_set_id_to_hash
    assert 2 in contract.authority_set_id_to_hash
    assert 3 in contract.authority_set_id_to_hash
    from vectorx_tpu.hash.sha256 import chained_hash

    assert contract.authority_set_id_to_hash[2] == \
        chained_hash(CHAIN.era_pubkeys(2))
    # every epoch-end block must be a committed head (stepping stone)
    assert 20 in contract.block_height_to_header_hash
    assert 40 in contract.block_height_to_header_hash
    assert contract.block_height_to_header_hash[40] == \
        CHAIN.get_block_hash(40)


def test_blocks_behind_head_health_signal():
    """The reference's external monitoring watches blocksBehindHead
    (/root/reference/README.md:121-133); the operator now reports it."""
    gw, contract, op = make_system()
    head = CHAIN.get_head().block_number
    before = op.blocks_behind_head()
    assert before == head - contract.latest_block > 0
    res = op.run_once()
    drain(gw)
    assert res["blocks_behind_head"] == before  # measured pre-fulfill
    assert op.blocks_behind_head() < before     # catching up


def test_commitments_match_fetcher():
    gw, contract, op = make_system()
    op.run_once()
    drain(gw)
    # find the stored range
    key = next(iter(contract.data_root_commitments))
    start = contract.range_start_blocks[key]
    # recover end from events
    ev = [e for e in contract.events
          if e.name == "HeaderRangeCommitmentStored"][0]
    end = ev.args["endBlock"]
    assert range_key(start, end) == key
    state_c, data_c = CHAIN.get_merkle_root_commitments(16, start, end)
    assert contract.data_root_commitments[key] == data_c
    assert contract.state_root_commitments[key] == state_c


def test_operator_waits_for_rotate_at_epoch_end():
    # Contract stuck at an epoch end knowing only the OLD set: header_range
    # must wait until the rotate for the next set lands (vectorx.rs:229-238).
    # (compute_genesis at an epoch end would already store the new set, so
    # build the stuck state directly.)
    from vectorx_tpu.hash.sha256 import chained_hash

    gw = make_gateway(CHAIN, max_authority_set_size=8, max_num_headers=16)
    contract = VectorXContract(
        gw, EPOCH, CHAIN.get_block_hash(EPOCH), 0,
        chained_hash(CHAIN.era_pubkeys(0)),
        header_range_commitment_tree_size=16)
    op = VectorXOperator(contract, CHAIN,
                         OperatorConfig(update_delay_blocks=10))
    res = op.find_and_request_header_range()
    assert res is False  # next set hash not stored yet
    assert op.find_and_request_rotate() is True
    drain(gw)
    assert op.find_and_request_header_range() is True
    drain(gw)
    assert contract.latest_block > EPOCH


def test_frozen_contract_rejects_commits():
    gw, contract, op = make_system()
    contract.update_freeze(True)
    op.run_once()
    with pytest.raises(Exception):
        drain(gw)


def test_justification_indexer_and_store():
    store = JustificationStore()
    idx = JustificationIndexer(CHAIN, store, chain_id="fixture")
    n = idx.run_follow(up_to=25)
    assert n == 25
    blocks = store.get_blocks_in_range("fixture", 10, 20)
    assert blocks == list(range(10, 21))
    j = store.get_justification("fixture", 20)  # epoch end block
    assert j is not None
    assert j.authority_set_id == 0  # signed by the old set
    assert sum(j.validator_signed) * 3 > j.num_authorities * 2
    # round-trip through JSON
    back = StoredJustificationData.from_json(j.to_json())
    assert back == j


def test_events_indexer_cursor_and_ranges():
    gw, contract, op = make_system()
    store = JustificationStore()
    ev_idx = EventsIndexer(contract, store, eth_chain_id=1)
    op.run_once()
    drain(gw)
    stored = ev_idx.run_once()
    assert stored >= 1
    assert ev_idx.run_once() == 0  # cursor advanced, nothing new
    ranges = store.get_data_commitment_ranges(1, contract.address, 0, 10**9)
    assert len(ranges) == stored
    start, end, commitment = ranges[0]
    assert contract.data_root_commitments[range_key(start, end)] == commitment


def test_fill_block_range_recovery():
    gw, contract, _ = make_system(genesis_block=4, tree_size=16)
    fill = compute_fill(CHAIN, 4, 52, tree_size=16)
    apply_fill(contract, fill)
    assert contract.latest_block == 52
    assert contract.block_height_to_header_hash[52] == \
        CHAIN.get_block_hash(52)
    state_c, data_c = CHAIN.get_merkle_root_commitments(16, 4, 20)
    assert contract.data_root_commitments[range_key(4, 20)] == data_c


def test_genesis_display():
    g = compute_genesis(CHAIN, 10)
    text = g.display()
    assert "GENESIS_HEIGHT=10" in text
    assert g.header_hash == CHAIN.get_block_hash(10)


def test_succinct_gateway_wiring(monkeypatch):
    """zk="succinct" routes BOTH functions through the succinct pipeline
    and the gateway verifies before the callback (the verifiedCall trust
    boundary).  The proving itself is monkeypatched (full machine proves
    are slow-gated; see test_succinct_*_full_roundtrip) — this pins the
    WIRING: prover outputs flow, verifier rejection reverts."""
    from dataclasses import dataclass

    import vectorx_tpu.circuits.succinct_header_range as shr
    import vectorx_tpu.circuits.succinct_rotate as srt
    from vectorx_tpu.circuits import DummyHeaderRange, DummyRotate
    from vectorx_tpu.services.contract import ContractError

    @dataclass
    class FakeProof:
        input_bytes: bytes
        output_bytes: bytes
        magic: int = 1234

    calls = {"hr_v": 0, "rt_v": 0}

    monkeypatch.setattr(
        shr, "prove_header_range_succinct",
        lambda fetcher, inp, tree_size, config: FakeProof(
            inp, DummyHeaderRange(tree_size).run(inp, CHAIN)))
    monkeypatch.setattr(
        shr, "verify_header_range_succinct",
        lambda p, config: (calls.__setitem__("hr_v", calls["hr_v"] + 1),
                           p.magic == 1234)[1])
    monkeypatch.setattr(
        srt, "prove_rotate_succinct",
        lambda fetcher, inp, max_authorities, config: FakeProof(
            inp, DummyRotate().run(inp, CHAIN)))
    monkeypatch.setattr(
        srt, "verify_rotate_succinct",
        lambda p, max_authorities, config: (
            calls.__setitem__("rt_v", calls["rt_v"] + 1), True)[1])

    gw = make_gateway(CHAIN, max_authority_set_size=8, max_num_headers=16,
                      zk="succinct")
    g = compute_genesis(CHAIN, 4)
    contract = VectorXContract(
        gw, g.height, g.header_hash, g.authority_set_id,
        g.authority_set_hash, header_range_commitment_tree_size=16)
    op = VectorXOperator(contract, CHAIN,
                         OperatorConfig(update_delay_blocks=10))
    op.run_once()
    drain(gw)
    assert contract.latest_block > 4
    assert calls["hr_v"] >= 1            # gateway verified before callback
    # a rejecting verifier must revert the fulfillment
    monkeypatch.setattr(shr, "verify_header_range_succinct",
                        lambda p, config: False)
    gw2 = make_gateway(CHAIN, max_authority_set_size=8, max_num_headers=16,
                       zk="succinct")
    contract2 = VectorXContract(
        gw2, g.height, g.header_hash, g.authority_set_id,
        g.authority_set_hash, header_range_commitment_tree_size=16)
    VectorXOperator(contract2, CHAIN,
                    OperatorConfig(update_delay_blocks=10)).run_once()
    with pytest.raises(ContractError, match="GatewayProofRejected"):
        drain(gw2)
    assert contract2.latest_block == g.height     # no state change
