"""Blake2b-256 AIR: proves digest_i = Blake2b256(message_i) for a BATCH
of independent messages in one trace.

The TPU-native counterpart of the reference's curta Blake2b STARK — the
Avail header-hash gadget (`curta_blake2b_variable`,
/root/reference/circuits/builder/header.rs:13-20; SURVEY.md §2 E3 lists it
as the first accelerated gadget to replace).

Arithmetization — one HALF-ROUND per row (column phase / diagonal phase),
25-row section per 128-byte block:

* the 16-word working state v lives as 64 bit-columns per word (1024 bit
  columns); XORs are degree-2 bit polynomials and the G rotations
  (32/24/16/63) are free bit reindexings;
* each row runs 4 G functions; the per-G intermediate values a₁,d₁,c₁,b₁
  get their own bit columns (4·4·64 = 1024); the G outputs are the next
  row's state;
* 64-bit additions split into two 32-bit limb equations with 2-bit carry
  columns (sums stay ≪ p, so the integer equations are sound in GF(p));
* the chaining state h is 8×64 bit columns, copy-constrained through the
  section, initialized/finalized with XOR constraints (h' = h ⊕ v_low ⊕
  v_high at the handoff row);
* the 16 message words are 32 limb columns (copy-constrained within a
  section, pinned at each section-start row to preprocessed `mc` message
  columns); σ-routing is done with 0/1 selector-constant columns (part of
  the committed verification key), so each G's x/y operands are Σ_w sel·m_w;
* the block counter t and finalization flag are constants per section
  (the message length is public).

STATEMENT BINDING: messages and claimed digests live in preprocessed
columns (`mc*`, `dg*`, `sel_msgstart`, `sel_digest`) exactly as in
sha256_air — the verifier derives the constants commitment from the
statement itself, so a proof only verifies against the exact batch of
(message, digest) pairs it was built for.
"""

from __future__ import annotations

import numpy as np

from vectorx_tpu.stark.air import Air

SECTION = 25  # 24 half-rounds + post-state/handoff row

_IV = [0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
       0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
       0x1f83d9abfb41bd6b, 0x5be0cd19137e2179]

_SIGMA = [
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
]

# word quadruples per phase: column rows use (0,4,8,12).., diagonal rows
# use the rolled pattern
_COL_QUADS = [(0, 4, 8, 12), (1, 5, 9, 13), (2, 6, 10, 14), (3, 7, 11, 15)]
_DIAG_QUADS = [(0, 5, 10, 15), (1, 6, 11, 12), (2, 7, 8, 13), (3, 4, 9, 14)]


def blake2b_pad(message: bytes) -> list[bytes]:
    """Zero-pad to whole 128-byte blocks (≥ 1 block, per Blake2b)."""
    blocks = []
    if not message:
        return [b"\x00" * 128]
    for i in range(0, len(message), 128):
        blk = message[i:i + 128]
        blocks.append(blk + b"\x00" * (128 - len(blk)))
    return blocks


# ---------------------------------------------------------------------------
# column layout
# ---------------------------------------------------------------------------

def _layout():
    names = []
    for w in range(16):                       # working state v, bits
        names += [f"V{w}_{i}" for i in range(64)]
    for g in range(4):                        # per-G intermediates, bits
        for nm in ("a1", "d1", "c1", "b1"):
            names += [f"I{g}{nm}_{i}" for i in range(64)]
    for w in range(8):                        # chain h, bits
        names += [f"H{w}_{i}" for i in range(64)]
    for w in range(16):                       # message limbs (lo, hi)
        names += [f"M{w}lo", f"M{w}hi"]
    # carries: per G, 4 adds × (lo 2 bits + hi 2 bits)
    for g in range(4):
        for add_i in range(4):
            names += [f"C{g}_{add_i}_{i}" for i in range(4)]
    # digest limbs as word columns (bindable by boundaries in public mode)
    for w in range(4):
        names += [f"DG{w}lo", f"DG{w}hi"]
    return {n: i for i, n in enumerate(names)}

_COLS = _layout()
WIDTH = len(_COLS)

_CONST_NAMES = (["sel_col", "sel_diag", "sel_state", "sel_hcopy",
                 "sel_mcopy", "sel_init", "sel_final",
                 "v12init_lo", "v12init_hi", "v14init_lo", "v14init_hi",
                 # statement binding (batched statements live in the
                 # preprocessed columns — see sha256_air module docstring)
                 "sel_msgstart", "sel_digest",
                 # mode gates: = sel_init / sel_digest in bind="consts",
                 # zero in bind="public" (statement moves to boundaries)
                 "sel_mpin", "sel_dgpin"]
                + [f"mc{w}{p}" for w in range(16) for p in ("lo", "hi")]
                + [f"dg{w}{p}" for w in range(4) for p in ("lo", "hi")]
                + [f"sig{g}_{op}_{w}" for g in range(4) for op in (0, 1)
                   for w in range(16)])
_CONST = {n: i for i, n in enumerate(_CONST_NAMES)}
N_CONST = len(_CONST)

# parameterized IV (digest_size=32, no key) — the chain start of every message
_H0 = list(_IV)
_H0[0] ^= 0x01010000 ^ 32


def _as_messages(messages) -> list[bytes]:
    if isinstance(messages, (bytes, bytearray)):
        return [bytes(messages)]
    return [bytes(m) for m in messages]


def _vbits(cols, w):
    base = _COLS[f"V{w}_0"]
    return cols[base:base + 64]


def _ibits(cols, g, nm):
    base = _COLS[f"I{g}{nm}_0"]
    return cols[base:base + 64]


def _hbits(cols, w):
    base = _COLS[f"H{w}_0"]
    return cols[base:base + 64]


class Blake2bAir(Air):
    """Blake2b-256 (digest_size=32, no key) of a batch of messages.
    Pass a single `bytes` or a list of them."""

    def comp_cache_key(self):
        # device transition reads statement data only through
        # consts/boundary values (traced) - graph shareable by shape
        from vectorx_tpu.stark.air import scalar_attrs_cache_key
        return scalar_attrs_cache_key(self)


    def __init__(self, messages, bind: str = "consts"):
        assert bind in ("consts", "public")
        self.bind = bind
        self.messages = _as_messages(messages)
        self._shape()
        super().__init__(width=WIDTH, log_n=self._log_n,
                         constraint_degree=4)
        self._run()

    @classmethod
    def public_shape(cls, msg_lens: list[int]) -> "Blake2bAir":
        """Verifier-side construction for bind="public": only message
        LENGTHS are statement data; message limbs and digest limbs arrive
        through the public inputs (typically wired tape handles)."""
        self = object.__new__(cls)
        self.bind = "public"
        # zero messages of the right lengths fix the shape (t counters,
        # section counts) without fixing any content
        self.messages = [b"\x00" * L for L in msg_lens]
        self._shape()
        Air.__init__(self, width=WIDTH, log_n=self._log_n,
                     constraint_degree=4)
        self.msg_digest_words = None
        self._per_msg = None
        return self

    def _shape(self):
        assert self.messages
        self.msg_blocks = [blake2b_pad(m) for m in self.messages]
        self.bases = []
        row = 0
        for blocks in self.msg_blocks:
            self.bases.append(row)
            row += SECTION * len(blocks) + 1   # sections + digest row
        self.total_rows = row
        # n ≥ total_rows + 1 keeps every digest row out of the masked
        # last transition row
        self._log_n = max(5, self.total_rows.bit_length())

    @property
    def message(self) -> bytes:
        assert len(self.messages) == 1
        return self.messages[0]

    @property
    def blocks(self) -> list[bytes]:
        assert len(self.messages) == 1
        return self.msg_blocks[0]

    @property
    def num_blocks(self):
        return sum(len(b) for b in self.msg_blocks)

    # -- reference computation / witness ------------------------------------

    @staticmethod
    def _rotr(x, n):
        return ((x >> n) | (x << (64 - n))) & ((1 << 64) - 1)

    def _t_for(self, mi: int, s: int) -> int:
        """Byte counter after block s of message mi (Blake2b semantics:
        message length for the last block, 128·(s+1) otherwise)."""
        if s == len(self.msg_blocks[mi]) - 1:
            return len(self.messages[mi]) if self.messages[mi] else 0
        return 128 * (s + 1)

    def _run(self):
        self._per_msg = []   # per message: (rows, inters, carries, chains)
        self.msg_digest_words = []
        for mi in range(len(self.messages)):
            self._run_message(mi)
        self.digest_words = self.msg_digest_words[-1] \
            if len(self.messages) == 1 else None

    def _run_message(self, mi: int):
        M64 = (1 << 64) - 1
        h = list(_H0)
        chains = [list(h)]
        m_rows = []           # per section: list of 25 v-state snapshots
        m_inters = []         # per section: per row, per g, (a1,d1,c1,b1)
        m_carries = []        # per section: per row, per g, 4 (lo,hi)
        blocks = self.msg_blocks[mi]
        for s, blk in enumerate(blocks):
            m = [int.from_bytes(blk[8 * w:8 * w + 8], "little")
                 for w in range(16)]
            v = h[:8] + list(_IV)
            v[12] ^= self._t_for(mi, s) & M64
            is_last = (s == len(blocks) - 1)
            if is_last:
                v[14] ^= M64
            states = [list(v)]
            inters = []
            carries = []
            M32 = 0xFFFFFFFF

            def add64_with_carries(terms_rec):
                """terms: 64-bit ints; returns (sum mod 2^64, c_lo, c_hi)."""
                lo = sum(t & M32 for t in terms_rec)
                c_lo = lo >> 32
                hi = sum(t >> 32 for t in terms_rec) + c_lo
                c_hi = hi >> 32
                return ((hi & M32) << 32) | (lo & M32), c_lo, c_hi

            for hr in range(24):
                rnd = hr // 2
                quads = _COL_QUADS if hr % 2 == 0 else _DIAG_QUADS
                sig = _SIGMA[rnd]
                row_inters = []
                row_carries = []
                for g, (ia, ib, ic, id_) in enumerate(quads):
                    base = (0 if hr % 2 == 0 else 8) + 2 * g
                    x = m[sig[base]]
                    y = m[sig[base + 1]]
                    a, b, c, d = v[ia], v[ib], v[ic], v[id_]
                    a1, c0l, c0h = add64_with_carries([a, b, x])
                    d1 = self._rotr(d ^ a1, 32)
                    c1, c1l, c1h = add64_with_carries([c, d1])
                    b1 = self._rotr(b ^ c1, 24)
                    a2, c2l, c2h = add64_with_carries([a1, b1, y])
                    d2 = self._rotr(d1 ^ a2, 16)
                    c2, c3l, c3h = add64_with_carries([c1, d2])
                    b2 = self._rotr(b1 ^ c2, 63)
                    v[ia], v[ib], v[ic], v[id_] = a2, b2, c2, d2
                    row_inters.append((a1, d1, c1, b1))
                    row_carries.append(((c0l, c0h), (c1l, c1h),
                                        (c2l, c2h), (c3l, c3h)))
                states.append(list(v))
                inters.append(row_inters)
                carries.append(row_carries)
            h = [(hv ^ v[i] ^ v[i + 8]) for i, hv in enumerate(h)]
            chains.append(list(h))
            m_rows.append(states)
            m_inters.append(inters)
            m_carries.append(carries)
        self._per_msg.append((m_rows, m_inters, m_carries, chains))
        self.msg_digest_words.append(chains[-1][:4])

    def digest_bytes(self) -> bytes:
        assert len(self.messages) == 1
        return b"".join(int.to_bytes(x, 8, "little")
                        for x in self.msg_digest_words[0])

    def digest_bytes_list(self) -> list[bytes]:
        return [b"".join(int.to_bytes(x, 8, "little") for x in d)
                for d in self.msg_digest_words]

    # -- AIR interface ------------------------------------------------------

    def public_inputs(self):
        if self.bind == "public":
            # shape count + per message: 32 limbs per 128-B section, then
            # 8 digest limbs; real values are supplied by wiring
            out = [len(self.messages)]
            for mi, blocks in enumerate(self.msg_blocks):
                for blk in blocks:
                    for w in range(16):
                        mw = int.from_bytes(blk[8 * w:8 * w + 8], "little")
                        out += [mw & 0xFFFFFFFF, mw >> 32]
                if self.msg_digest_words is not None:
                    for w in range(4):
                        dw = self.msg_digest_words[mi][w]
                        out += [dw & 0xFFFFFFFF, dw >> 32]
                else:
                    out += [0] * 8
            return out
        # the statement lives in the preprocessed columns (see the
        # sha256_air module docstring); the constants cap binds it
        return [len(self.messages)]

    def constant_columns(self):
        cols = np.zeros((N_CONST, self.n), dtype=np.uint64)
        for mi, blocks in enumerate(self.msg_blocks):
            mbase = self.bases[mi]
            for s, blk in enumerate(blocks):
                base = mbase + s * SECTION
                for hr in range(24):
                    r = base + hr
                    cols[_CONST["sel_col" if hr % 2 == 0 else "sel_diag"],
                         r] = 1
                    rnd = hr // 2
                    sig = _SIGMA[rnd]
                    off = 0 if hr % 2 == 0 else 8
                    for g in range(4):
                        cols[_CONST[f"sig{g}_0_{sig[off + 2 * g]}"], r] = 1
                        cols[_CONST[f"sig{g}_1_{sig[off + 2 * g + 1]}"], r] = 1
                for r in range(25):
                    cols[_CONST["sel_state"], base + r] = 1
                for r in range(24):
                    cols[_CONST["sel_hcopy"], base + r] = 1
                    cols[_CONST["sel_mcopy"], base + r] = 1
                cols[_CONST["sel_init"], base] = 1
                cols[_CONST["sel_final"], base + 24] = 1
                # precomputed t/f-injected IV words for this section
                v12 = _IV[4] ^ self._t_for(mi, s)
                v14 = _IV[6] ^ ((1 << 64) - 1) if s == len(blocks) - 1 \
                    else _IV[6]
                cols[_CONST["v12init_lo"], base] = v12 & 0xFFFFFFFF
                cols[_CONST["v12init_hi"], base] = v12 >> 32
                cols[_CONST["v14init_lo"], base] = v14 & 0xFFFFFFFF
                cols[_CONST["v14init_hi"], base] = v14 >> 32
                if self.bind == "consts":
                    # statement: the section's message limbs, bound to the
                    # M witness columns at the section-start row
                    cols[_CONST["sel_mpin"], base] = 1
                    for w in range(16):
                        mw = int.from_bytes(blk[8 * w:8 * w + 8], "little")
                        cols[_CONST[f"mc{w}lo"], base] = mw & 0xFFFFFFFF
                        cols[_CONST[f"mc{w}hi"], base] = mw >> 32
            cols[_CONST["sel_msgstart"], mbase] = 1
            drow = mbase + SECTION * len(blocks)
            cols[_CONST["sel_digest"], drow] = 1
            if self.bind == "consts":
                cols[_CONST["sel_dgpin"], drow] = 1
                for w in range(4):
                    dw = self.msg_digest_words[mi][w]
                    cols[_CONST[f"dg{w}lo"], drow] = dw & 0xFFFFFFFF
                    cols[_CONST[f"dg{w}hi"], drow] = dw >> 32
        return cols

    def boundaries(self, public):
        if self.bind != "public":
            return []
        out = []
        idx = 1  # public[0] = message count
        for mi, blocks in enumerate(self.msg_blocks):
            mbase = self.bases[mi]
            for si in range(len(blocks)):
                base = mbase + si * SECTION
                for w in range(16):
                    out.append((base, _COLS[f"M{w}lo"], public[idx]))
                    out.append((base, _COLS[f"M{w}hi"], public[idx + 1]))
                    idx += 2
            drow = mbase + SECTION * len(blocks)
            for w in range(4):
                out.append((drow, _COLS[f"DG{w}lo"], public[idx]))
                out.append((drow, _COLS[f"DG{w}hi"], public[idx + 1]))
                idx += 2
        return out

    # The transition is generated and shared by the scalar (verifier) and
    # device (prover) paths; the device path is a stacked re-emission of the
    # SAME constraints in the SAME order.
    def transition(self, alg, local, nxt, public, consts=None):
        from vectorx_tpu.stark.air import DeviceAlgebra

        if alg is DeviceAlgebra:
            return self._transition_device(local, nxt, consts)
        one = alg.constant(1)
        two = alg.constant(2)

        def word32(bits):
            acc = None
            for i, b in enumerate(bits):
                t = alg.mul(alg.constant(1 << i), b)
                acc = t if acc is None else alg.add(acc, t)
            return acc

        def xor2(x, y):
            return alg.sub(alg.add(x, y), alg.mul(two, alg.mul(x, y)))

        sel_col = consts[_CONST["sel_col"]]
        sel_diag = consts[_CONST["sel_diag"]]
        sel_state = consts[_CONST["sel_state"]]
        sel_hcopy = consts[_CONST["sel_hcopy"]]
        sel_mcopy = consts[_CONST["sel_mcopy"]]
        sel_init = consts[_CONST["sel_init"]]
        sel_final = consts[_CONST["sel_final"]]
        sel_round = alg.add(sel_col, sel_diag)

        out = []

        def gate(sel, e):
            out.append(alg.mul(sel, e))

        # booleanity
        for w in range(16):
            for b in _vbits(local, w):
                gate(sel_state, alg.mul(b, alg.sub(b, one)))
        for g in range(4):
            for nm in ("a1", "d1", "c1", "b1"):
                for b in _ibits(local, g, nm):
                    gate(sel_round, alg.mul(b, alg.sub(b, one)))
        for w in range(8):
            for b in _hbits(local, w):
                gate(sel_state, alg.mul(b, alg.sub(b, one)))
        for g in range(4):
            for add_i in range(4):
                for i in range(4):
                    b = local[_COLS[f"C{g}_{add_i}_{i}"]]
                    gate(sel_round, alg.mul(b, alg.sub(b, one)))

        # copies: h and m constant within a section
        for w in range(8):
            hb = _hbits(local, w)
            hbn = _hbits(nxt, w)
            for i in range(64):
                gate(sel_hcopy, alg.sub(hbn[i], hb[i]))
        for w in range(16):
            gate(sel_mcopy, alg.sub(nxt[_COLS[f"M{w}lo"]],
                                    local[_COLS[f"M{w}lo"]]))
            gate(sel_mcopy, alg.sub(nxt[_COLS[f"M{w}hi"]],
                                    local[_COLS[f"M{w}hi"]]))

        # G functions for both phases
        def add64_eqs(sel, out_bits, in_terms_lo, in_terms_hi, g, add_i):
            """out + carries·2^32 = inputs, limb-wise."""
            c_lo = [local[_COLS[f"C{g}_{add_i}_{i}"]] for i in range(2)]
            c_hi = [local[_COLS[f"C{g}_{add_i}_{i}"]] for i in range(2, 4)]
            carry_lo = alg.add(c_lo[0], alg.mul(two, c_lo[1]))
            carry_hi = alg.add(c_hi[0], alg.mul(two, c_hi[1]))
            lo_out = word32(out_bits[:32])
            hi_out = word32(out_bits[32:])
            lhs_lo = alg.add(lo_out, alg.mul(alg.constant(1 << 32), carry_lo))
            rhs_lo = in_terms_lo[0]
            for t in in_terms_lo[1:]:
                rhs_lo = alg.add(rhs_lo, t)
            gate(sel, alg.sub(lhs_lo, rhs_lo))
            lhs_hi = alg.add(hi_out, alg.mul(alg.constant(1 << 32), carry_hi))
            rhs_hi = in_terms_hi[0]
            for t in in_terms_hi[1:]:
                rhs_hi = alg.add(rhs_hi, t)
            rhs_hi = alg.add(rhs_hi, carry_lo)
            gate(sel, alg.sub(lhs_hi, rhs_hi))

        def xor_rot_eqs(sel, out_bits, xa, xb, rot):
            """out = rotr(xa ⊕ xb, rot):  out_i = xa_{(i+rot)%64} ⊕ xb_…"""
            for i in range(64):
                j = (i + rot) % 64
                gate(sel, alg.sub(out_bits[i], xor2(xa[j], xb[j])))

        def msg_operand(g, op):
            lo = None
            hi = None
            for w in range(16):
                sel = consts[_CONST[f"sig{g}_{op}_{w}"]]
                tl = alg.mul(sel, local[_COLS[f"M{w}lo"]])
                th = alg.mul(sel, local[_COLS[f"M{w}hi"]])
                lo = tl if lo is None else alg.add(lo, tl)
                hi = th if hi is None else alg.add(hi, th)
            return lo, hi

        # Blocked emission order (step-major, then g) so the vectorized
        # device path can stack the 4 G's of each step into one pass.
        for phase, quads, sel in ((0, _COL_QUADS, sel_col),
                                  (1, _DIAG_QUADS, sel_diag)):
            gvars = []
            for g, (ia, ib, ic, id_) in enumerate(quads):
                gvars.append(dict(
                    A=_vbits(local, ia), B=_vbits(local, ib),
                    C=_vbits(local, ic), D=_vbits(local, id_),
                    An=_vbits(nxt, ia), Bn=_vbits(nxt, ib),
                    Cn=_vbits(nxt, ic), Dn=_vbits(nxt, id_),
                    a1=_ibits(local, g, "a1"), d1=_ibits(local, g, "d1"),
                    c1=_ibits(local, g, "c1"), b1=_ibits(local, g, "b1"),
                    mx=msg_operand(g, 0), my=msg_operand(g, 1)))
            for g, v in enumerate(gvars):   # a1 = a + b + x
                add64_eqs(sel, v["a1"],
                          [word32(v["A"][:32]), word32(v["B"][:32]),
                           v["mx"][0]],
                          [word32(v["A"][32:]), word32(v["B"][32:]),
                           v["mx"][1]], g, 0)
            for g, v in enumerate(gvars):   # d1 = rotr32(d ^ a1)
                xor_rot_eqs(sel, v["d1"], v["D"], v["a1"], 32)
            for g, v in enumerate(gvars):   # c1 = c + d1
                add64_eqs(sel, v["c1"],
                          [word32(v["C"][:32]), word32(v["d1"][:32])],
                          [word32(v["C"][32:]), word32(v["d1"][32:])], g, 1)
            for g, v in enumerate(gvars):   # b1 = rotr24(b ^ c1)
                xor_rot_eqs(sel, v["b1"], v["B"], v["c1"], 24)
            for g, v in enumerate(gvars):   # a2 = a1 + b1 + y
                add64_eqs(sel, v["An"],
                          [word32(v["a1"][:32]), word32(v["b1"][:32]),
                           v["my"][0]],
                          [word32(v["a1"][32:]), word32(v["b1"][32:]),
                           v["my"][1]], g, 2)
            for g, v in enumerate(gvars):   # d2 = rotr16(d1 ^ a2)
                xor_rot_eqs(sel, v["Dn"], v["d1"], v["An"], 16)
            for g, v in enumerate(gvars):   # c2 = c1 + d2
                add64_eqs(sel, v["Cn"],
                          [word32(v["c1"][:32]), word32(v["Dn"][:32])],
                          [word32(v["c1"][32:]), word32(v["Dn"][32:])], g, 3)
            for g, v in enumerate(gvars):   # b2 = rotr63(b1 ^ c2)
                xor_rot_eqs(sel, v["Bn"], v["b1"], v["Cn"], 63)

        # section init: v = h[0..8] ++ IV with t/f injections (at the
        # section-start row, the v columns themselves must match)
        for w in range(8):
            hb = _hbits(local, w)
            vb = _vbits(local, w)
            for i in range(64):
                gate(sel_init, alg.sub(vb[i], hb[i]))
        for w in range(8, 16):
            vb = _vbits(local, w)
            iv = _IV[w - 8]
            if w == 12:
                # the t-injected word is a per-section preprocessed constant
                gate(sel_init, alg.sub(word32(vb[:32]),
                                       consts[_CONST["v12init_lo"]]))
                gate(sel_init, alg.sub(word32(vb[32:]),
                                       consts[_CONST["v12init_hi"]]))
            elif w == 14:
                gate(sel_init, alg.sub(word32(vb[:32]),
                                       consts[_CONST["v14init_lo"]]))
                gate(sel_init, alg.sub(word32(vb[32:]),
                                       consts[_CONST["v14init_hi"]]))
            else:
                for i in range(64):
                    gate(sel_init, alg.sub(vb[i],
                                           alg.constant((iv >> i) & 1)))

        # handoff: next.h = h ⊕ v_low ⊕ v_high (degree-3 xor3 expansion so
        # the gated constraint stays within the degree-4 budget)
        def xor3(x, y, z):
            s = alg.add(alg.add(x, y), z)
            p = alg.add(alg.add(alg.mul(x, y), alg.mul(y, z)),
                        alg.mul(z, x))
            xyz = alg.mul(alg.mul(x, y), z)
            return alg.add(alg.sub(s, alg.mul(two, p)),
                           alg.mul(alg.constant(4), xyz))

        for w in range(8):
            hb = _hbits(local, w)
            hbn = _hbits(nxt, w)
            vlo = _vbits(local, w)
            vhi = _vbits(local, w + 8)
            for i in range(64):
                gate(sel_final,
                     alg.sub(hbn[i], xor3(hb[i], vlo[i], vhi[i])))

        # statement binding (mirrored bit-for-bit by the device path):
        # message limbs pin to the preprocessed mc columns at each section
        # start, the chain loads the parameterized IV at message starts,
        # and the digest row pins the first 4 chain words to dg columns
        sel_mpin = consts[_CONST["sel_mpin"]]
        for w in range(16):
            gate(sel_mpin, alg.sub(local[_COLS[f"M{w}lo"]],
                                   consts[_CONST[f"mc{w}lo"]]))
            gate(sel_mpin, alg.sub(local[_COLS[f"M{w}hi"]],
                                   consts[_CONST[f"mc{w}hi"]]))
        sel_msgstart = consts[_CONST["sel_msgstart"]]
        for w in range(8):
            hb = _hbits(local, w)
            for i in range(64):
                gate(sel_msgstart,
                     alg.sub(hb[i], alg.constant((_H0[w] >> i) & 1)))
        sel_digest = consts[_CONST["sel_digest"]]
        sel_dgpin = consts[_CONST["sel_dgpin"]]
        for w in range(4):
            hb = _hbits(local, w)
            gate(sel_dgpin, alg.sub(word32(hb[:32]),
                                    consts[_CONST[f"dg{w}lo"]]))
            gate(sel_dgpin, alg.sub(word32(hb[32:]),
                                    consts[_CONST[f"dg{w}hi"]]))
        # digest-limb word columns (boundary-bindable in public mode)
        for w in range(4):
            hb = _hbits(local, w)
            gate(sel_digest, alg.sub(local[_COLS[f"DG{w}lo"]],
                                     word32(hb[:32])))
            gate(sel_digest, alg.sub(local[_COLS[f"DG{w}hi"]],
                                     word32(hb[32:])))

        return out
    # -- witness ------------------------------------------------------------

    def build_trace(self) -> np.ndarray:
        tr = np.zeros((WIDTH, self.n), dtype=np.uint64)
        for mi in range(len(self.messages)):
            self._build_message_trace(tr, mi)
        return tr

    def _build_message_trace(self, tr: np.ndarray, mi: int) -> None:
        m_rows, m_inters, m_carries, chains = self._per_msg[mi]
        mbase = self.bases[mi]
        blocks = self.msg_blocks[mi]
        for s, blk in enumerate(blocks):
            base = mbase + s * SECTION
            states = m_rows[s]
            inters = m_inters[s]
            carries = m_carries[s]
            chain = chains[s]
            m = [int.from_bytes(blk[8 * w:8 * w + 8], "little")
                 for w in range(16)]
            for r in range(25):
                v = states[r]
                for w in range(16):
                    for i in range(64):
                        tr[_COLS[f"V{w}_{i}"], base + r] = (v[w] >> i) & 1
                for w in range(8):
                    for i in range(64):
                        tr[_COLS[f"H{w}_{i}"], base + r] = (chain[w] >> i) & 1
                for w in range(16):
                    tr[_COLS[f"M{w}lo"], base + r] = m[w] & 0xFFFFFFFF
                    tr[_COLS[f"M{w}hi"], base + r] = m[w] >> 32
            for r in range(24):
                for g in range(4):
                    a1, d1, c1, b1 = inters[r][g]
                    for nm, val in (("a1", a1), ("d1", d1),
                                    ("c1", c1), ("b1", b1)):
                        for i in range(64):
                            tr[_COLS[f"I{g}{nm}_{i}"], base + r] = \
                                (val >> i) & 1
                    for add_i, (cl, ch) in enumerate(carries[r][g]):
                        tr[_COLS[f"C{g}_{add_i}_0"], base + r] = cl & 1
                        tr[_COLS[f"C{g}_{add_i}_1"], base + r] = (cl >> 1) & 1
                        tr[_COLS[f"C{g}_{add_i}_2"], base + r] = ch & 1
                        tr[_COLS[f"C{g}_{add_i}_3"], base + r] = (ch >> 1) & 1
        # chain value after the last handoff (the digest row)
        final_row = mbase + len(blocks) * SECTION
        for w in range(8):
            for i in range(64):
                tr[_COLS[f"H{w}_{i}"], final_row] = \
                    (chains[-1][w] >> i) & 1
        for w in range(4):
            dw = chains[-1][w]
            tr[_COLS[f"DG{w}lo"], final_row] = dw & 0xFFFFFFFF
            tr[_COLS[f"DG{w}hi"], final_row] = dw >> 32

    @classmethod
    def statement(cls, messages, claimed_digests) -> "Blake2bAir":
        """Verifier-side statement: messages + claimed 32-byte digests,
        without computing any hash.  Accepts a single message + digest or
        parallel lists."""
        self = object.__new__(cls)
        self.bind = "consts"
        self.messages = _as_messages(messages)
        if isinstance(claimed_digests, (bytes, bytearray)):
            claimed_digests = [bytes(claimed_digests)]
        assert len(claimed_digests) == len(self.messages)
        assert all(len(d) == 32 for d in claimed_digests)
        self._shape()
        Air.__init__(self, width=WIDTH, log_n=self._log_n,
                     constraint_degree=4)
        self.msg_digest_words = [
            [int.from_bytes(d[8 * i:8 * i + 8], "little") for i in range(4)]
            for d in claimed_digests]
        self.digest_words = self.msg_digest_words[-1] \
            if len(self.messages) == 1 else None
        self._per_msg = None   # statement-only: no witness data
        return self

    def _transition_device(self, local, nxt, consts):
        """Vectorized device evaluation — identical constraints and emission
        order to the scalar path, stacked over bit/G axes (the eager scalar
        graph is ~100k dispatches; this is a few hundred)."""
        import jax.numpy as jnp

        from vectorx_tpu.field import goldilocks as gl

        N = local[0][0].shape[0] if hasattr(local[0][0], "shape") else None

        def stack_range(cols, start, count):
            return (jnp.stack([cols[start + i][0] for i in range(count)]),
                    jnp.stack([cols[start + i][1] for i in range(count)]))

        def stack_list(pairs):
            return (jnp.stack([p[0] for p in pairs]),
                    jnp.stack([p[1] for p in pairs]))

        def add(a, b):
            return gl.add(a[0], a[1], b[0], b[1])

        def sub(a, b):
            return gl.sub(a[0], a[1], b[0], b[1])

        def mul(a, b):
            return gl.mul(a[0], a[1], b[0], b[1])

        def cmul(k, a):
            kk = int(k) % gl.P
            return gl.mul(a[0], a[1], np.uint32(kk & 0xFFFFFFFF),
                          np.uint32(kk >> 32))

        POW32 = np.array([1 << i for i in range(32)], dtype=np.uint64)
        PL = (POW32 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        PH = (POW32 >> np.uint64(32)).astype(np.uint32)

        def word32_axis(bits, axis_len=32):
            """bits: (..., 32, N) stacked pair -> (..., N) weighted sum."""
            shape = [1] * (bits[0].ndim)
            shape[-2] = axis_len
            wl = PL[:axis_len].reshape(shape)
            wh = PH[:axis_len].reshape(shape)
            tl, th = gl.mul(bits[0], bits[1], wl, wh)
            while tl.shape[-2] > 1:
                half = tl.shape[-2] // 2
                sl, sh = gl.add(tl[..., :half, :], th[..., :half, :],
                                tl[..., half:2 * half, :],
                                th[..., half:2 * half, :])
                if tl.shape[-2] % 2:
                    sl = jnp.concatenate([sl, tl[..., -1:, :]], axis=-2)
                    sh = jnp.concatenate([sh, th[..., -1:, :]], axis=-2)
                tl, th = sl, sh
            return tl[..., 0, :], th[..., 0, :]

        sels = {nm: consts[_CONST[nm]] for nm in
                ("sel_col", "sel_diag", "sel_state", "sel_hcopy",
                 "sel_mcopy", "sel_init", "sel_final")}
        sel_round = add(sels["sel_col"], sels["sel_diag"])

        out = []

        def gate_rows(sel, rows):
            """rows: stacked (k, N) pair; gate and append k constraints."""
            s = sel if isinstance(sel, tuple) else sels[sel]
            glo, ghi = gl.mul(rows[0], rows[1], s[0][None, :], s[1][None, :])
            out.extend((glo[i], ghi[i]) for i in range(glo.shape[0]))
            return glo, ghi

        def booleanity(sel, rows):
            m = gl.sub(rows[0], rows[1], np.uint32(1), np.uint32(0))
            gate_rows(sel, gl.mul(rows[0], rows[1], m[0], m[1]))

        # --- booleanity (same family order as the scalar path) -------------
        booleanity("sel_state", stack_range(local, _COLS["V0_0"], 1024))
        booleanity(sel_round, stack_range(local, _COLS["I0a1_0"], 1024))
        booleanity("sel_state", stack_range(local, _COLS["H0_0"], 512))
        booleanity(sel_round, stack_range(local, _COLS["C0_0_0"], 64))

        # --- copies ---------------------------------------------------------
        hb = stack_range(local, _COLS["H0_0"], 512)
        hbn = stack_range(nxt, _COLS["H0_0"], 512)
        gate_rows("sel_hcopy", sub(hbn, hb))
        mb = stack_range(local, _COLS["M0lo"], 32)
        mbn = stack_range(nxt, _COLS["M0lo"], 32)
        gate_rows("sel_mcopy", sub(mbn, mb))

        # --- G functions -----------------------------------------------------
        def gword(cols, idxs):
            """stack the 64-bit words at V indices idxs -> (4, 64, N)."""
            lo = jnp.stack([jnp.stack(
                [cols[_COLS[f"V{w}_{i}"]][0] for i in range(64)])
                for w in idxs])
            hi = jnp.stack([jnp.stack(
                [cols[_COLS[f"V{w}_{i}"]][1] for i in range(64)])
                for w in idxs])
            return lo, hi

        def gibits(nm):
            lo = jnp.stack([jnp.stack(
                [local[_COLS[f"I{g}{nm}_{i}"]][0] for i in range(64)])
                for g in range(4)])
            hi = jnp.stack([jnp.stack(
                [local[_COLS[f"I{g}{nm}_{i}"]][1] for i in range(64)])
                for g in range(4)])
            return lo, hi

        def gcarry(add_i):
            """(4, 4, N) carry bits for this add across the 4 G's."""
            lo = jnp.stack([jnp.stack(
                [local[_COLS[f"C{g}_{add_i}_{i}"]][0] for i in range(4)])
                for g in range(4)])
            hi = jnp.stack([jnp.stack(
                [local[_COLS[f"C{g}_{add_i}_{i}"]][1] for i in range(4)])
                for g in range(4)])
            return lo, hi

        M = stack_range(local, _COLS["M0lo"], 32)          # (32, N)
        Mlo = (M[0][0::2], M[1][0::2])                     # (16, N)
        Mhi = (M[0][1::2], M[1][1::2])

        def msg_operands(op):
            """(4, N) routed message limbs for operand op of each G."""
            sel = (jnp.stack([jnp.stack(
                [consts[_CONST[f"sig{g}_{op}_{w}"]][0] for w in range(16)])
                for g in range(4)]),
                jnp.stack([jnp.stack(
                    [consts[_CONST[f"sig{g}_{op}_{w}"]][1]
                     for w in range(16)]) for g in range(4)]))
            tl, th = gl.mul(sel[0], sel[1], Mlo[0][None], Mlo[1][None])
            lo = (jnp.zeros_like(tl[:, 0]), jnp.zeros_like(th[:, 0]))
            sl, sh = tl, th
            while sl.shape[1] > 1:
                half = sl.shape[1] // 2
                sl, sh2 = gl.add(sl[:, :half], sh[:, :half],
                                 sl[:, half:2 * half], sh[:, half:2 * half])
                sh = sh2
            lo = (sl[:, 0], sh[:, 0])
            tl, th = gl.mul(sel[0], sel[1], Mhi[0][None], Mhi[1][None])
            sl, sh = tl, th
            while sl.shape[1] > 1:
                half = sl.shape[1] // 2
                sl, sh2 = gl.add(sl[:, :half], sh[:, :half],
                                 sl[:, half:2 * half], sh[:, half:2 * half])
                sh = sh2
            hi = (sl[:, 0], sh[:, 0])
            return lo, hi

        def emit_add(sel, out_bits, lo_terms, hi_terms, add_i):
            """Interleave lo/hi equations per g, matching the scalar order
            [g0_lo, g0_hi, g1_lo, g1_hi, ...]."""
            cb = gcarry(add_i)                             # (4, 4, N)
            c_lo = gl.add(cb[0][:, 0], cb[1][:, 0],
                          *cmul(2, (cb[0][:, 1], cb[1][:, 1])))
            c_hi = gl.add(cb[0][:, 2], cb[1][:, 2],
                          *cmul(2, (cb[0][:, 3], cb[1][:, 3])))
            out_lo = word32_axis((out_bits[0][:, :32], out_bits[1][:, :32]))
            out_hi = word32_axis((out_bits[0][:, 32:], out_bits[1][:, 32:]))
            lhs_lo = add(out_lo, cmul(1 << 32, c_lo))
            rhs_lo = lo_terms[0]
            for t in lo_terms[1:]:
                rhs_lo = add(rhs_lo, t)
            lhs_hi = add(out_hi, cmul(1 << 32, c_hi))
            rhs_hi = hi_terms[0]
            for t in hi_terms[1:]:
                rhs_hi = add(rhs_hi, t)
            rhs_hi = add(rhs_hi, c_lo)
            e_lo = sub(lhs_lo, rhs_lo)                     # (4, N)
            e_hi = sub(lhs_hi, rhs_hi)
            s = sel
            glo_l, ghi_l = gl.mul(e_lo[0], e_lo[1], s[0][None], s[1][None])
            glo_h, ghi_h = gl.mul(e_hi[0], e_hi[1], s[0][None], s[1][None])
            for g in range(4):
                out.append((glo_l[g], ghi_l[g]))
                out.append((glo_h[g], ghi_h[g]))

        def emit_xor_rot(sel, out_bits, xa, xb, rot):
            """out_i = xa_{(i+rot)%64} ⊕ xb_{(i+rot)%64}; emission g-major,
            bit-minor, matching the scalar loops."""
            ra = (jnp.roll(xa[0], -rot, axis=1), jnp.roll(xa[1], -rot, axis=1))
            rb = (jnp.roll(xb[0], -rot, axis=1), jnp.roll(xb[1], -rot, axis=1))
            x2 = sub(add(ra, rb), cmul(2, mul(ra, rb)))
            e = sub(out_bits, x2)                          # (4, 64, N)
            s = sel
            glo, ghi = gl.mul(e[0], e[1], s[0][None, None], s[1][None, None])
            for g in range(4):
                for i in range(64):
                    out.append((glo[g, i], ghi[g, i]))

        for phase, quads, selname in ((0, _COL_QUADS, "sel_col"),
                                      (1, _DIAG_QUADS, "sel_diag")):
            sel = sels[selname]
            ia = [q[0] for q in quads]
            ib = [q[1] for q in quads]
            ic = [q[2] for q in quads]
            id_ = [q[3] for q in quads]
            A = gword(local, ia); B = gword(local, ib)
            C = gword(local, ic); D = gword(local, id_)
            An = gword(nxt, ia); Bn = gword(nxt, ib)
            Cn = gword(nxt, ic); Dn = gword(nxt, id_)
            a1 = gibits("a1"); d1 = gibits("d1")
            c1 = gibits("c1"); b1 = gibits("b1")
            mx = msg_operands(0)
            my = msg_operands(1)

            def w32lo(x):
                return word32_axis((x[0][:, :32], x[1][:, :32]))

            def w32hi(x):
                return word32_axis((x[0][:, 32:], x[1][:, 32:]))

            emit_add(sel, a1, [w32lo(A), w32lo(B), mx[0]],
                     [w32hi(A), w32hi(B), mx[1]], 0)
            emit_xor_rot(sel, d1, D, a1, 32)
            emit_add(sel, c1, [w32lo(C), w32lo(d1)],
                     [w32hi(C), w32hi(d1)], 1)
            emit_xor_rot(sel, b1, B, c1, 24)
            emit_add(sel, An, [w32lo(a1), w32lo(b1), my[0]],
                     [w32hi(a1), w32hi(b1), my[1]], 2)
            emit_xor_rot(sel, Dn, d1, An, 16)
            emit_add(sel, Cn, [w32lo(c1), w32lo(Dn)],
                     [w32hi(c1), w32hi(Dn)], 3)
            emit_xor_rot(sel, Bn, b1, Cn, 63)

        # --- section init ----------------------------------------------------
        vb_low = stack_range(local, _COLS["V0_0"], 512)
        hb_all = stack_range(local, _COLS["H0_0"], 512)
        gate_rows("sel_init", sub(vb_low, hb_all))
        sel_init = sels["sel_init"]
        for w in range(8, 16):
            vb = stack_range(local, _COLS[f"V{w}_0"], 64)
            iv = _IV[w - 8]
            if w == 12:
                lo = word32_axis((vb[0][None, :32], vb[1][None, :32]))
                hi = word32_axis((vb[0][None, 32:], vb[1][None, 32:]))
                e_lo = sub((lo[0][0], lo[1][0]), consts[_CONST["v12init_lo"]])
                e_hi = sub((hi[0][0], hi[1][0]), consts[_CONST["v12init_hi"]])
                out.append(mul(sel_init, e_lo))
                out.append(mul(sel_init, e_hi))
            elif w == 14:
                lo = word32_axis((vb[0][None, :32], vb[1][None, :32]))
                hi = word32_axis((vb[0][None, 32:], vb[1][None, 32:]))
                e_lo = sub((lo[0][0], lo[1][0]), consts[_CONST["v14init_lo"]])
                e_hi = sub((hi[0][0], hi[1][0]), consts[_CONST["v14init_hi"]])
                out.append(mul(sel_init, e_lo))
                out.append(mul(sel_init, e_hi))
            else:
                ivbits = np.array([(iv >> i) & 1 for i in range(64)],
                                  dtype=np.uint32)
                e = gl.sub(vb[0], vb[1], ivbits[:, None],
                           np.uint32(0))
                gate_rows("sel_init", e)

        # --- handoff ---------------------------------------------------------
        vlo_b = stack_range(local, _COLS["V0_0"], 512)
        vhi_b = stack_range(local, _COLS["V8_0"], 512)
        hb2 = stack_range(local, _COLS["H0_0"], 512)
        hbn2 = stack_range(nxt, _COLS["H0_0"], 512)
        s3 = add(add(hb2, vlo_b), vhi_b)
        p3 = add(add(mul(hb2, vlo_b), mul(vlo_b, vhi_b)), mul(vhi_b, hb2))
        xyz = mul(mul(hb2, vlo_b), vhi_b)
        x3 = add(sub(s3, cmul(2, p3)), cmul(4, xyz))
        gate_rows("sel_final", sub(hbn2, x3))

        # --- statement binding (same emission order as the scalar path) ------
        # message limbs vs mc columns at section starts (w-major, lo/hi)
        mc = (jnp.stack([consts[_CONST[f"mc{w}{p}"]][0]
                         for w in range(16) for p in ("lo", "hi")]),
              jnp.stack([consts[_CONST[f"mc{w}{p}"]][1]
                         for w in range(16) for p in ("lo", "hi")]))
        sel_mp = consts[_CONST["sel_mpin"]]
        gate_rows((sel_mp[0], sel_mp[1]), sub(mb, mc))
        # chain = parameterized IV at message starts (w-major, bit-minor)
        h0bits = np.array([(_H0[w] >> i) & 1 for w in range(8)
                           for i in range(64)], dtype=np.uint32)
        e_ms = gl.sub(hb2[0], hb2[1], h0bits[:, None], np.uint32(0))
        sel_ms = consts[_CONST["sel_msgstart"]]
        gate_rows((sel_ms[0], sel_ms[1]), e_ms)
        # digest row: first 4 chain words vs dg columns (w-major, lo/hi)
        sel_dg = consts[_CONST["sel_digest"]]
        sel_dgp = consts[_CONST["sel_dgpin"]]
        hws = []
        for w in range(4):
            hwb = stack_range(local, _COLS[f"H{w}_0"], 64)
            lo = word32_axis((hwb[0][None, :32], hwb[1][None, :32]))
            hi = word32_axis((hwb[0][None, 32:], hwb[1][None, 32:]))
            hws.append(((lo[0][0], lo[1][0]), (hi[0][0], hi[1][0])))
            e_lo = sub(hws[w][0], consts[_CONST[f"dg{w}lo"]])
            e_hi = sub(hws[w][1], consts[_CONST[f"dg{w}hi"]])
            out.append(mul(sel_dgp, e_lo))
            out.append(mul(sel_dgp, e_hi))
        # digest-limb word columns (boundary-bindable in public mode)
        for w in range(4):
            e_lo = sub(local[_COLS[f"DG{w}lo"]], hws[w][0])
            e_hi = sub(local[_COLS[f"DG{w}hi"]], hws[w][1])
            out.append(mul(sel_dg, e_lo))
            out.append(mul(sel_dg, e_hi))

        return out
