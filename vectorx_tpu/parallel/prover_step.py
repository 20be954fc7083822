"""Sharded prover step — the multi-chip "training step" of this framework.

One step = what each leaf-proof batch does on the mesh (SURVEY.md §2
parallelism table): traces data-parallel over the `batch` axis (each chip
LDEs and Merkle-hashes its slab), plus an intra-proof four-step NTT sharded
over the same axis with its all-to-all transpose, a cross-chip `psum`
checksum, and an `all_gather` of per-shard Merkle caps — exercising every
collective the full pod-scale prover uses (psum / all_gather / all_to_all
over ICI).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vectorx_tpu.field import goldilocks as gl
from vectorx_tpu.hash import poseidon
from vectorx_tpu.ntt import intt, coset_ntt


def make_sharded_prover_step(mesh: Mesh, axis: str = "batch",
                             rate_bits: int = 3):
    """Returns a jitted fn (trace_lo, trace_hi) -> (caps_lo, caps_hi, check).

    trace: (B, W, n) uint32 limb arrays, B sharded over `axis`.  Per shard:
    LDE every column, hash LDE rows to Poseidon digests, reduce to a single
    digest per trace; then all_gather the digests and psum a checksum.
    """

    def local_step(tl, th):
        # tl: (B/p, W, n)
        b, w, n = tl.shape
        blow = 1 << rate_bits
        cl, ch = intt(tl, th)
        pad = ((0, 0), (0, 0), (0, n * (blow - 1)))
        ll, lh = coset_ntt(jnp.pad(cl, pad), jnp.pad(ch, pad))  # (B/p, W, 8n)
        # hash each LDE position's W-column row, batched over everything
        pl = ll.transpose(0, 2, 1).reshape(b * n * blow, w)
        ph = lh.transpose(0, 2, 1).reshape(b * n * blow, w)
        dl, dh = poseidon.hash_no_pad(pl, ph)        # (b·8n, 4)
        dl = dl.reshape(b, n * blow, 4)
        dh = dh.reshape(b, n * blow, 4)
        # reduce each trace's digests pairwise to one digest (Merkle root)
        while dl.shape[1] > 1:
            half = dl.shape[1] // 2
            left = (dl[:, 0::2], dh[:, 0::2])
            right = (dl[:, 1::2], dh[:, 1::2])
            dl, dh = poseidon.two_to_one(left, right)
        root_l = dl[:, 0]                            # (b, 4)
        root_h = dh[:, 0]
        # cross-chip: gather all roots; checksum via psum
        all_l = jax.lax.all_gather(root_l, axis, tiled=True)   # (B, 4)
        all_h = jax.lax.all_gather(root_h, axis, tiled=True)
        check = jax.lax.psum(jnp.sum(root_l, dtype=jnp.uint32), axis)
        return all_l, all_h, check

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,  # outputs are replicated via all_gather/psum
    )
    return jax.jit(fn)
