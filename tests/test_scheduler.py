"""Distributed scheduler: staged header_range jobs, worker partitioning,
checkpoint/resume, and equality with the monolithic pipeline."""

import pytest

from vectorx_tpu.circuits import DummyHeaderRange, HeaderRangeCircuit
from vectorx_tpu.hash.sha256 import chained_hash
from vectorx_tpu.io.abi import HeaderRangeInput
from vectorx_tpu.io.fixtures import FixtureChain
from vectorx_tpu.parallel.scheduler import CheckpointStore, HeaderRangeJob

CHAIN = FixtureChain(seed=13, num_blocks=80, epoch_length=30,
                     authorities_per_era=lambda e: 4)


def make_input(trusted=6, target=33, set_id=1):
    return HeaderRangeInput(
        trusted_block=trusted,
        trusted_header_hash=CHAIN.get_block_hash(trusted),
        authority_set_id=set_id,
        authority_set_hash=chained_hash(CHAIN.era_pubkeys(set_id)),
        target_block=target,
    ).encode()


def test_staged_job_matches_monolithic_pipeline():
    inp = make_input()
    job = HeaderRangeJob(CHAIN, inp, max_num_headers=32,
                         max_authority_set_size=8)
    out = job.run()
    mono = HeaderRangeCircuit(max_authority_set_size=8,
                              max_num_headers=32).run(inp, CHAIN)
    dummy = DummyHeaderRange(32).run(inp, CHAIN)
    assert out == mono == dummy


def test_checkpoint_resume(tmp_path):
    inp = make_input()
    store = CheckpointStore(str(tmp_path))
    job1 = HeaderRangeJob(CHAIN, inp, max_num_headers=32,
                          max_authority_set_size=8, store=store)
    # run only the map stage, simulating a job killed before reduce
    job1.run_map_stage()
    assert job1.stats.computed == 4  # 32/8 leaves

    # a fresh worker (fresh memory) resumes from the filesystem checkpoints
    store2 = CheckpointStore(str(tmp_path))
    job2 = HeaderRangeJob(CHAIN, inp, max_num_headers=32,
                          max_authority_set_size=8, store=store2)
    out = job2.run()
    assert job2.stats.cached >= 4           # every leaf came from disk
    assert out == DummyHeaderRange(32).run(inp, CHAIN)

    # a third run recomputes nothing at all
    job3 = HeaderRangeJob(CHAIN, inp, max_num_headers=32,
                          max_authority_set_size=8,
                          store=CheckpointStore(str(tmp_path)))
    out3 = job3.run()
    assert job3.stats.computed == 0
    assert out3 == out


def test_multi_worker_partition(tmp_path):
    inp = make_input(trusted=2, target=60, set_id=1)
    store_path = str(tmp_path)
    # two workers split the map stage deterministically
    all_leaves = []
    for wid in (0, 1):
        job = HeaderRangeJob(CHAIN, inp, max_num_headers=64,
                             max_authority_set_size=8,
                             store=CheckpointStore(store_path),
                             worker_id=wid, n_workers=2)
        all_leaves += job.run_map_stage()
    assert sorted(all_leaves) == list(range(8))  # 64/8 leaves, disjoint
    # worker 0 finishes the reduce from shared checkpoints
    fin = HeaderRangeJob(CHAIN, inp, max_num_headers=64,
                         max_authority_set_size=8,
                         store=CheckpointStore(store_path))
    out = fin.run()
    assert out == DummyHeaderRange(64).run(inp, CHAIN)
    # reduce+justify+output computed, leaves all cached
    assert fin.stats.cached >= 8


def test_job_rejects_bad_trusted_hash():
    bad = HeaderRangeInput(
        trusted_block=6, trusted_header_hash=b"\x00" * 32,
        authority_set_id=1,
        authority_set_hash=chained_hash(CHAIN.era_pubkeys(1)),
        target_block=33).encode()
    job = HeaderRangeJob(CHAIN, bad, max_num_headers=32,
                         max_authority_set_size=8)
    with pytest.raises(Exception):
        job.run()
