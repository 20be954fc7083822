"""CLI entry points — equivalents of the reference's 11 binaries
(/root/reference/Cargo.toml:12-58).  Run as ``python -m vectorx_tpu.bin.<name>``:

operator, indexer, events, genesis, fill_block_range — services;
header_range_256, header_range_512, rotate,
dummy_header_range_256, dummy_header_range_512, dummy_rotate —
circuit entrypoints with the ``build`` / ``prove input.json`` contract
(reference succinct.json; ours is prover.json).
"""
