"""Distributed proof scheduler with per-stage checkpointing.

The reference distributes its map-reduce leaf proofs through a closed
platform and has NO resumability — "Proof jobs are not resumable"
(SURVEY.md §5).  This scheduler is the TPU-native replacement: a
header_range job is decomposed into deterministic, content-keyed stages

    leaf:<j>      — fetch + hash + link-check 8 headers (device Blake2b)
    reduce:<l>:<k>— combine two subchain nodes (SHA-256 parent)
    justify       — simple-justification check on the target header
    output        — assemble the packed ABI output

whose results persist in a `CheckpointStore` (filesystem JSON, shared via
NFS/GCS in a pod deployment).  Any worker can resume a partially-complete
job; leaves are partitioned deterministically over workers
(leaf j → worker j mod n_workers), so a pod slice splits the map stage
without coordination.  Every worker derives identical Fiat-Shamir state
because stage results — not transcripts — are shared (SURVEY.md §7 hard
part 7).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from vectorx_tpu.circuits.justification import verify_simple_justification
from vectorx_tpu.circuits.subchain import (HEADERS_PER_MAP, SubchainError,
                                           _next_pow2, decode_header_fields)
from vectorx_tpu.hash.blake2b import blake2b_batch
from vectorx_tpu.hash.sha256 import sha256
from vectorx_tpu.io.abi import HeaderRangeInput, HeaderRangeOutput


class CheckpointStore:
    """Keyed JSON blobs on the filesystem; `None` path = in-memory only."""

    def __init__(self, root: str | None = None):
        self.root = Path(root) if root else None
        if self.root:
            self.root.mkdir(parents=True, exist_ok=True)
        self.mem: dict[str, dict] = {}

    def _path(self, job: str, stage: str) -> Path:
        safe = stage.replace(":", "_")
        return self.root / job / f"{safe}.json"

    def get(self, job: str, stage: str) -> dict | None:
        if (v := self.mem.get(f"{job}/{stage}")) is not None:
            return v
        if self.root:
            p = self._path(job, stage)
            if p.exists():
                v = json.loads(p.read_text())
                self.mem[f"{job}/{stage}"] = v
                return v
        return None

    def put(self, job: str, stage: str, value: dict) -> None:
        self.mem[f"{job}/{stage}"] = value
        if self.root:
            p = self._path(job, stage)
            p.parent.mkdir(parents=True, exist_ok=True)
            tmp = p.with_suffix(".tmp")
            tmp.write_text(json.dumps(value))
            tmp.rename(p)

    def stages_done(self, job: str) -> int:
        return len([k for k in self.mem if k.startswith(f"{job}/")]) + (
            len(list((self.root / job).glob("*.json")))
            if self.root and (self.root / job).exists() else 0)


@dataclass
class SchedulerStats:
    computed: int = 0
    cached: int = 0


@dataclass
class HeaderRangeJob:
    """Staged, resumable header_range proving job."""

    fetcher: object
    input_bytes: bytes
    max_num_headers: int
    max_header_size: int = 35840
    max_authority_set_size: int = 300
    store: CheckpointStore = field(default_factory=CheckpointStore)
    worker_id: int = 0
    n_workers: int = 1
    stats: SchedulerStats = field(default_factory=SchedulerStats)

    def __post_init__(self):
        self.inp = HeaderRangeInput.decode(self.input_bytes)
        self.num_leaves = _next_pow2(self.max_num_headers // HEADERS_PER_MAP)
        self.job_id = hashlib.sha256(
            b"header_range" + self.input_bytes
            + self.max_num_headers.to_bytes(4, "little")).hexdigest()[:16]

    # -- stage runners ------------------------------------------------------

    def _stage(self, name: str, compute):
        cached = self.store.get(self.job_id, name)
        if cached is not None:
            self.stats.cached += 1
            return cached
        value = compute()
        self.stats.computed += 1
        self.store.put(self.job_id, name, value)
        return value

    def _leaf(self, j: int) -> dict:
        def compute():
            base = self.inp.trusted_block + 1 + j * HEADERS_PER_MAP
            buf = np.zeros((HEADERS_PER_MAP, self.max_header_size), np.uint8)
            sizes = np.zeros(HEADERS_PER_MAP, np.uint32)
            encs = []
            for i in range(HEADERS_PER_MAP):
                block = base + i
                if block <= self.inp.target_block:
                    enc = self.fetcher.get_encoded_header(block)
                    buf[i, :len(enc)] = np.frombuffer(enc, np.uint8)
                    sizes[i] = len(enc)
                    encs.append(enc)
                else:
                    encs.append(b"")
            hashes = blake2b_batch(buf, sizes)
            decoded = [decode_header_fields(encs[i], int(sizes[i]))
                       for i in range(HEADERS_PER_MAP)]
            # masked link checks (subchain_verification.rs:136-210 semantics)
            batch_end = base + HEADERS_PER_MAP - 1
            disabled = self.inp.target_block < base
            noop = disabled
            end_block, end_hash = 0, b"\x00" * 32
            num = 0
            state_leaves, data_leaves = [], []
            for i in range(HEADERS_PER_MAP):
                d = decoded[i]
                h = hashes[i].tobytes()
                if i > 0 and not noop:
                    prev = decoded[i - 1]
                    if d.parent_hash != hashes[i - 1].tobytes() or \
                            d.block_number != prev.block_number + 1:
                        raise SubchainError(f"broken link at {base + i}")
                if not noop:
                    end_block, end_hash = d.block_number, h
                    num += 1
                    state_leaves.append(d.state_root)
                    data_leaves.append(d.data_root)
                else:
                    state_leaves.append(b"\x00" * 32)
                    data_leaves.append(b"\x00" * 32)
                if d.block_number == self.inp.target_block and not disabled:
                    noop = True
            if not disabled and decoded[0].block_number != base:
                raise SubchainError(f"leaf {j}: first block mismatch")
            if not noop and end_block != batch_end:
                raise SubchainError(f"leaf {j}: last block mismatch")
            # 8-leaf roots
            state_root = _merkle8(state_leaves)
            data_root = _merkle8(data_leaves)
            return {
                "num_blocks": num,
                "start_block": decoded[0].block_number,
                "start_header_hash": hashes[0].tobytes().hex(),
                "start_parent": decoded[0].parent_hash.hex(),
                "end_block": end_block,
                "end_header_hash": end_hash.hex(),
                "state_root": state_root.hex(),
                "data_root": data_root.hex(),
            }

        return self._stage(f"leaf:{j}", compute)

    def _reduce(self, level: int, k: int, left: dict, right: dict) -> dict:
        def compute():
            right_inactive = right["num_blocks"] == 0
            if not right_inactive:
                if left["end_header_hash"] != right["start_parent"] or \
                        left["end_block"] != right["start_block"] - 1:
                    raise SubchainError("subchains not linked in reduce")
            pick = left if right_inactive else right
            return {
                "num_blocks": left["num_blocks"] + right["num_blocks"],
                "start_block": left["start_block"],
                "start_header_hash": left["start_header_hash"],
                "start_parent": left["start_parent"],
                "end_block": pick["end_block"],
                "end_header_hash": pick["end_header_hash"],
                "state_root": sha256(
                    bytes.fromhex(left["state_root"])
                    + bytes.fromhex(right["state_root"])).hex(),
                "data_root": sha256(
                    bytes.fromhex(left["data_root"])
                    + bytes.fromhex(right["data_root"])).hex(),
            }

        return self._stage(f"reduce:{level}:{k}", compute)

    # -- driver -------------------------------------------------------------

    def run_map_stage(self) -> list[int]:
        """Compute this worker's partition of leaves; returns leaf indices."""
        mine = [j for j in range(self.num_leaves)
                if j % self.n_workers == self.worker_id]
        for j in mine:
            self._leaf(j)
        return mine

    def run(self) -> bytes:
        """Drive the job to completion (requires all leaves available —
        in multi-worker runs every worker runs `run_map_stage` first and
        worker 0 finishes with `run`)."""
        nodes = [self._leaf(j) for j in range(self.num_leaves)]
        level = 0
        while len(nodes) > 1:
            nodes = [self._reduce(level, k, nodes[2 * k], nodes[2 * k + 1])
                     for k in range(len(nodes) // 2)]
            level += 1
        root = nodes[0]

        if bytes.fromhex(root["start_parent"]) != self.inp.trusted_header_hash:
            raise SubchainError("start parent != trusted header hash")
        if root["end_block"] != self.inp.target_block:
            raise SubchainError("end block != target block")

        def justify():
            j = self.fetcher.get_justification(
                self.inp.target_block,
                max_authorities=self.max_authority_set_size)
            verify_simple_justification(
                j, self.inp.target_block,
                bytes.fromhex(root["end_header_hash"]),
                self.inp.authority_set_id, self.inp.authority_set_hash)
            return {"ok": True}

        self._stage("justify", justify)

        out = HeaderRangeOutput(
            target_header_hash=bytes.fromhex(root["end_header_hash"]),
            state_root_commitment=bytes.fromhex(root["state_root"]),
            data_root_commitment=bytes.fromhex(root["data_root"]),
        ).encode()
        self._stage("output", lambda: {"output": out.hex()})
        return out


def _merkle8(leaves: list[bytes]) -> bytes:
    nodes = list(leaves)
    while len(nodes) > 1:
        nodes = [sha256(nodes[2 * i] + nodes[2 * i + 1])
                 for i in range(len(nodes) // 2)]
    return nodes[0]


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize jax.distributed for a real multi-host pod slice
    (SURVEY.md §5 "distributed communication backend").  No-op when no
    coordinator is configured (single host)."""
    if coordinator is None:
        return
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
