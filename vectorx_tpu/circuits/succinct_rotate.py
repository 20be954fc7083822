"""Succinct rotate: ONE machine proof, witness-mode epoch-end byte walk.

The product statement of the reference's Rotate circuit
(/root/reference/circuits/rotate.rs:67-121): for input
(authority_set_id, authority_set_hash) the verifier learns ONLY the new
authority set hash — the epoch-end header bytes never reach it.  The
reference proves the consensus-log walk and validator scan in-circuit
over witnessed header bytes (/root/reference/circuits/builder/
rotate.rs:169-276, hinted positions from input/mod.rs:835-968); here the
same checks are tape constraints over hidden Blake2b witness limbs:

* ONE Blake2b child over the witness header limbs (`bind="public"`
  wiring), digest pinned to the header hash the justification signs;
* the byte walk as in-tape constraints: consensus flag 0x04 + FRNK
  engine id, the ScheduledChange 0x01 flag, the compact-mode bits of the
  message-length prefix, the encoded authority count pinned to
  `compact_encode(num_authorities)`, and the full validator window
  (pubkey ‖ weight=1u64 LE ‖ … ‖ delay=0) pinned limb-wise — positions
  are statement metadata (the reference hints them too, rotate.rs:27-65),
  so every offset is statement-computable and fully-pinned limbs assert
  as single constants, with bit decomposition only at window edges;
* the CURRENT set's commitment chain pinned to the input hash, the NEW
  set's chain pinned to the output hash, and the GRANDPA justification
  (SHA-512 challenge + ed25519 ladder children) — all inside the SAME
  machine proof (succinct_header_range sections).

Disclosure model matches succinct_header_range: justification data and
the new validator set are public chain data carried as proof metadata;
the header BYTES are hidden.  Positions/lengths are shape metadata.
"""

from __future__ import annotations

import hashlib
import logging
from dataclasses import dataclass

from vectorx_tpu import scale
from vectorx_tpu.circuits.rotate import (DELAY_BYTES, VALIDATOR_LENGTH,
                                         WEIGHT_BYTES)
from vectorx_tpu.circuits.succinct_header_range import (
    MAX_CHILD_ROWS, _blake_rows, _byte_affine, _commitment_section,
    _justification_children, _limbs32, _ProofCursor, _sha_msg_rows,
    _words_be)
from vectorx_tpu.circuits.zk_commitment import chunk_by_rows
from vectorx_tpu.curves.ed25519 import L as ED_L
from vectorx_tpu.io.abi import RotateInput, RotateOutput
from vectorx_tpu.recursion import progcache
from vectorx_tpu.recursion.machine import MachineAir, compile_tape
from vectorx_tpu.recursion.shadow import verifier_tape
from vectorx_tpu.recursion.ssa import Affine, Builder, TapeCheckFailed
from vectorx_tpu.stark.blake2b_air import Blake2bAir, blake2b_pad
from vectorx_tpu.stark.ed25519_ladder_air import Ed25519LadderAir
from vectorx_tpu.stark.prover import StarkConfig, prove
from vectorx_tpu.stark.sha256_air import Sha256Air, sha256_pad
from vectorx_tpu.stark.sha512_air import Sha512Air
from vectorx_tpu.stark.verifier import verify

log = logging.getLogger(__name__)


@dataclass
class SuccinctRotateProof:
    """Verifier surface: (input_bytes, output_bytes, machine_proof) plus
    public metadata — walk positions (shape), the new validator set
    (commits to the output), and the justification's public vote data."""

    input_bytes: bytes
    output_bytes: bytes
    epoch_end_block: int
    header_len: int
    start_position: int
    len_prefix_consumed: int     # compact byte-length of the msg-len prefix
    num_authorities: int         # NEW set size
    new_pubkeys: list
    # justification public data (CURRENT set)
    signed_message: bytes
    pubkeys: list
    signatures: list
    validator_signed: list
    just_num_authorities: int
    challenge_digests: list
    machine_proof: object


def _pinned_bytes(stmt) -> dict:
    """offset -> expected byte, for every statement-pinned position of the
    epoch-end byte walk (rotate.rs:74-276 semantics)."""
    start = stmt["start_position"]
    pins = {start + 1: 4}
    for k, ev in enumerate(scale.CONSENSUS_ENGINE_ID):
        pins[start + 2 + k] = ev
    cursor = start + 6 + stmt["len_prefix_consumed"]
    pins[cursor] = 1                       # ScheduledChange flag
    cursor += 1
    for k, ev in enumerate(scale.compact_encode(stmt["num_authorities"])):
        pins[cursor + k] = ev
    cursor += len(scale.compact_encode(stmt["num_authorities"]))
    for i in range(stmt["num_authorities"]):
        off = cursor + i * VALIDATOR_LENGTH
        for k, pv in enumerate(stmt["new_pubkeys"][i]):
            pins[off + k] = pv
        for k, wv in enumerate(WEIGHT_BYTES):
            pins[off + 32 + k] = wv
    doff = cursor + stmt["num_authorities"] * VALIDATOR_LENGTH
    for k, dv in enumerate(DELAY_BYTES):
        pins[doff + k] = dv
    return pins


def _header_section(b: Builder, stmt, cfg, cursor, header, bh: bytes):
    """ONE Blake2b child over witness header limbs with the walk pinned.

    Fully-pinned limbs (and pad limbs) enter the child wiring as Affine
    constants — zero extra constraints; partially-pinned limbs stay
    witness and get bit-decomposed byte pins.  The digest is pinned to
    `bh` (public: it is bytes 1..33 of the signed precommit message)."""
    length = stmt["header_len"]
    pins = _pinned_bytes(stmt)
    air = Blake2bAir.public_shape([length])
    limbs = _limbs32(b"".join(blake2b_pad(header))) \
        if header is not None else None
    n_sections = max(1, (length + 127) // 128)
    ph = [Affine(const=(1, 0))]
    handles = {}
    partial = []                     # limbs needing byte-level treatment
    for pos in range(32 * n_sections):
        span = range(4 * pos, 4 * pos + 4)
        known = [pins.get(o, 0 if o >= length else None) for o in span]
        if all(k is not None for k in known):
            v = int.from_bytes(bytes(known), "little")
            h = Affine(const=(v, 0))
        else:
            v = limbs[pos] if limbs is not None else None
            h = b.fresh((v, 0) if v is not None else None, f"rot.{pos}")
            if any(k is not None for k in known):
                partial.append(pos)
        ph.append(h)
        handles[pos] = h
    bits = {}
    for pos in partial:
        bits[pos] = b.bitdec(handles[pos], 32, canonical=False)
        for o in range(4 * pos, 4 * pos + 4):
            exp = pins.get(o, 0 if o >= length else None)
            if exp is not None:
                b.assert_eq(_byte_affine(bits[pos], 8 * (o % 4)),
                            Affine(const=(exp, 0)), where=f"rot.b{o}")
    # compact-mode bits of the msg-len prefix (value itself stays hidden)
    mo = stmt["start_position"] + 6
    consumed = stmt["len_prefix_consumed"]
    if consumed == 5:
        # big-int mode for a u32: the prefix byte is exactly 0b11
        pos = mo // 4
        if pos not in bits:
            bits[pos] = b.bitdec(handles[pos], 32, canonical=False)
        b.assert_eq(_byte_affine(bits[pos], 8 * (mo % 4)),
                    Affine(const=(3, 0)), where="rot.lenmode")
    else:
        m = {1: (0, 0), 2: (1, 0), 4: (0, 1)}[consumed]
        pos = mo // 4
        if pos not in bits:
            bits[pos] = b.bitdec(handles[pos], 32, canonical=False)
        lo = 8 * (mo % 4)
        b.assert_eq(Affine(bits={bits[pos][lo]: 1}),
                    Affine(const=(m[0], 0)), where="rot.lenmode0")
        b.assert_eq(Affine(bits={bits[pos][lo + 1]: 1}),
                    Affine(const=(m[1], 0)), where="rot.lenmode1")
    ph += [Affine(const=(v, 0)) for v in _limbs32(bh)]
    verifier_tape(b, air, cfg, proof=cursor.next(), public_handles=ph)


def _rotate_tape(b: Builder, stmt, cfg, cursor, header):
    """Machine publics: [0..8) current set hash words, [8..16) new set
    hash words."""
    inp: RotateInput = stmt["inp"]
    out: RotateOutput = stmt["out"]
    auth_h = [b.public(v, i)
              for i, v in enumerate(_words_be(inp.authority_set_hash))]
    new_h = [b.public(v, 8 + i) for i, v in
             enumerate(_words_be(out.new_authority_set_hash))]
    bh = scale.decode_precommit(stmt["signed_message"])[0]

    _header_section(b, stmt, cfg, cursor, header, bh)
    _commitment_section(b, stmt["pubkeys"][:stmt["just_num_authorities"]],
                        auth_h, cfg, cursor, witness=header is not None)
    _commitment_section(b, stmt["new_pubkeys"][:stmt["num_authorities"]],
                        new_h, cfg, cursor, witness=header is not None)

    jstmt = {"num_authorities": stmt["just_num_authorities"],
             "validator_signed": stmt["validator_signed"],
             "signatures": stmt["signatures"], "pubkeys": stmt["pubkeys"],
             "signed_message": stmt["signed_message"],
             "challenge_digests": stmt["challenge_digests"]}
    _, sha_airs, ladder_airs = _justification_children(jstmt)
    for air in sha_airs:
        verifier_tape(b, air, cfg, proof=cursor.next(),
                      public_handles=[Affine(const=(v, 0))
                                      for v in air.public_inputs()])
    for air in ladder_airs:
        verifier_tape(b, air, cfg, proof=cursor.next(),
                      public_handles=[Affine(const=(v, 0))
                                      for v in air.public_inputs()])


def _stmt_prog_key(stmt, config: StarkConfig) -> str:
    """Content address of the statement-mode machine program: every input
    the verifier's own tape derivation reads (recursion/progcache.py)."""
    f = config.fri
    return progcache.digest_key(
        "succinct_rotate",
        f.rate_bits, f.cap_height, f.num_queries, f.final_poly_len,
        f.pow_bits,
        stmt["inp"].encode(), stmt["out"].encode(),
        stmt["epoch_end_block"], stmt["header_len"],
        stmt["start_position"], stmt["len_prefix_consumed"],
        stmt["num_authorities"], list(stmt["new_pubkeys"]),
        stmt["signed_message"], list(stmt["pubkeys"]),
        list(stmt["signatures"]),
        [bool(x) for x in stmt["validator_signed"]],
        stmt["just_num_authorities"], list(stmt["challenge_digests"]))


def _statement(input_bytes, output_bytes, meta: dict) -> dict:
    inp = RotateInput.decode(input_bytes)
    out = RotateOutput.decode(output_bytes)
    stmt = {"inp": inp, "out": out, **meta}
    n = stmt["num_authorities"]
    length = stmt["header_len"]
    start = stmt["start_position"]
    consumed = stmt["len_prefix_consumed"]
    if n < 1 or len(stmt["new_pubkeys"]) != n or \
            any(len(pk) != 32 for pk in stmt["new_pubkeys"]):
        raise ValueError("bad new validator set")
    if consumed not in (1, 2, 4, 5):
        raise ValueError("bad compact length prefix")
    end = start + 6 + consumed + 1 + len(scale.compact_encode(n)) \
        + n * VALIDATOR_LENGTH + 4
    if start < 0 or start + 8 > length:
        raise ValueError("scan window outside the hashed header")
    if end > length:
        raise ValueError("validator list extends past the hashed region")
    return stmt


def prove_rotate_succinct(fetcher, input_bytes: bytes,
                          max_authorities: int = 300,
                          config: StarkConfig = StarkConfig(),
                          outer_config: StarkConfig | None = None
                          ) -> SuccinctRotateProof:
    """Prove the full rotate statement as ONE machine STARK."""
    outer_config = outer_config or config
    inp = RotateInput.decode(input_bytes)
    epoch_end = fetcher.last_justified_block(inp.authority_set_id)
    rd = fetcher.get_header_rotate(epoch_end)
    header = rd.header_bytes[:rd.header_size]
    assert rd.num_authorities <= max_authorities
    new_pubkeys = list(rd.padded_pubkeys[:rd.num_authorities])
    sub = header[rd.start_position:]
    consumed = scale.compact_decode(sub[6:11])[2]

    j = fetcher.get_justification(epoch_end,
                                  max_authorities=max_authorities)
    assert j.authority_set_id == inp.authority_set_id
    enabled = [i for i in range(j.num_authorities) if j.validator_signed[i]]
    ch_msgs = [j.signatures[i][:32] + j.pubkeys[i] + j.signed_message
               for i in enabled]
    out = RotateOutput(new_authority_set_hash=rd.new_authority_set_hash)
    meta = {
        "epoch_end_block": epoch_end, "header_len": len(header),
        "start_position": rd.start_position, "len_prefix_consumed": consumed,
        "num_authorities": rd.num_authorities, "new_pubkeys": new_pubkeys,
        "signed_message": j.signed_message, "pubkeys": list(j.pubkeys),
        "signatures": list(j.signatures),
        "validator_signed": list(j.validator_signed),
        "just_num_authorities": j.num_authorities,
        "challenge_digests": [hashlib.sha512(m).digest() for m in ch_msgs],
    }
    stmt = _statement(input_bytes, out.encode(), meta)

    # ---- child proofs, in tape order --------------------------------------
    proofs = []
    log.info("rotate prove: %d-B epoch-end header, %d authorities — "
             "child proofs", len(header), rd.num_authorities)
    air = Blake2bAir([header], bind="public")
    assert air.digest_bytes_list()[0] == \
        scale.decode_precommit(j.signed_message)[0]
    proofs.append(prove(air, air.build_trace(), config))

    for pks in (list(j.pubkeys[:j.num_authorities]), new_pubkeys):
        acc = b""
        msgs = []
        for pk in pks:
            msgs.append(acc + pk)
            acc = hashlib.sha256(acc + pk).digest()
        si = 0
        for csz in chunk_by_rows([len(m) for m in msgs], _sha_msg_rows,
                                 MAX_CHILD_ROWS):
            cair = Sha256Air(msgs[si:si + csz], bind="public")
            proofs.append(prove(cair, cair.build_trace(), config))
            si += csz

    msgs, sha_airs, ladder_airs = _justification_children(stmt | {
        "num_authorities": stmt["just_num_authorities"]})
    pos = 0
    for s_air in sha_airs:
        live = Sha512Air(msgs[pos:pos + len(s_air.messages)])
        proofs.append(prove(live, live.build_trace(), config))
        pos += len(s_air.messages)
    for l_air in ladder_airs:
        live = Ed25519LadderAir(l_air.sigs)
        proofs.append(prove(live, live.build_trace(), config))
    log.info("rotate prove: %d child proofs done", len(proofs))

    # ---- the ONE machine proof --------------------------------------------
    b = Builder(witness=True)
    _rotate_tape(b, stmt, config, _ProofCursor(proofs), header)
    prog = compile_tape(b)
    mair = MachineAir(prog)
    log.info("rotate prove: machine proof %d rows x %d cols",
             mair.n, mair.width)
    machine_proof = prove(mair, mair.build_trace(), outer_config)
    log.info("rotate prove: done")
    # seed the machine-VK cache so the first verify skips tape re-derivation
    progcache.put(_stmt_prog_key(stmt, config), prog)
    return SuccinctRotateProof(
        input_bytes=input_bytes, output_bytes=out.encode(),
        machine_proof=machine_proof,
        **{k: meta[k] for k in meta})


def verify_rotate_succinct(proof: SuccinctRotateProof,
                           max_authorities: int = 300,
                           config: StarkConfig = StarkConfig(),
                           outer_config: StarkConfig | None = None) -> bool:
    """ONE STARK verification against (input, output) — the verifier never
    sees a header byte, hashes a message, or checks a signature."""
    outer_config = outer_config or config
    p = proof
    try:
        inp = RotateInput.decode(p.input_bytes)
        RotateOutput.decode(p.output_bytes)
    except Exception:
        return False
    if p.num_authorities > max_authorities:
        return False
    # justification bookkeeping on public data (zk_justification host side)
    if not (len(p.validator_signed) == len(p.pubkeys) == len(p.signatures)):
        return False
    if p.just_num_authorities <= 0 or \
            p.just_num_authorities > len(p.pubkeys):
        return False
    if any(p.validator_signed[i] for i in range(p.just_num_authorities,
                                                len(p.validator_signed))):
        return False
    try:
        _bh, bn, _round, sid = scale.decode_precommit(p.signed_message)
    except Exception:
        return False
    if bn != p.epoch_end_block or sid != inp.authority_set_id:
        return False
    num_signed = sum(bool(x) for x in p.validator_signed)
    if not num_signed * 3 > p.just_num_authorities * 2:
        return False
    enabled = [i for i in range(p.just_num_authorities)
               if p.validator_signed[i]]
    if len(p.challenge_digests) != len(enabled) or \
            any(len(d) != 64 for d in p.challenge_digests):
        return False
    for i in enabled:
        if int.from_bytes(p.signatures[i][32:], "little") >= ED_L:
            return False
    # ---- rebuild the statement tape and check the ONE proof ---------------
    try:
        stmt = _statement(p.input_bytes, p.output_bytes, {
            "epoch_end_block": p.epoch_end_block,
            "header_len": p.header_len,
            "start_position": p.start_position,
            "len_prefix_consumed": p.len_prefix_consumed,
            "num_authorities": p.num_authorities,
            "new_pubkeys": p.new_pubkeys,
            "signed_message": p.signed_message, "pubkeys": p.pubkeys,
            "signatures": p.signatures,
            "validator_signed": p.validator_signed,
            "just_num_authorities": p.just_num_authorities,
            "challenge_digests": p.challenge_digests})

        def _rebuild():
            b = Builder(witness=False)
            _rotate_tape(b, stmt, config, _ProofCursor(None), None)
            return compile_tape(b)

        mair = MachineAir(progcache.cached_program(
            _stmt_prog_key(stmt, config), _rebuild))
    except (TapeCheckFailed, Exception):
        return False
    try:
        return verify(mair, p.machine_proof, outer_config)
    except Exception:
        return False
