"""SHA-256 AIR: proves digest_i = SHA256(message_i) for a BATCH of
independent multi-block messages in one trace.

The TPU-native counterpart of the reference's curta SHA-256 STARK gadget
(`curta_sha256`, /root/reference/circuits/builder/justification.rs:140,156 —
SURVEY.md §2 E3): the authority-set chained commitment and the data-root
Merkle interior nodes are exactly chains of this hash.  Batching many
messages into one trace is what curta does too — it is the difference
between one proof and hundreds for the 300-step set commitment.

Arithmetization — one round per row, 65-row section per 64-byte block,
plus one digest row per message:

* message m occupies rows [base_m, base_m + 65·k_m]: k_m sections of
  64 round rows + a post-state/handoff row each, then a digest row;
* working variables a,b,c and e,f,g are 32 bit-columns each (rotations are
  free bit reindexings; Ch/Maj/Σ/σ are degree ≤ 3 bit polynomials); d and h
  only feed modular adds, so they stay word columns;
* the chaining value h0..h7 lives in 8 word columns, copy-constrained
  within a section; the handoff row adds the section's final working state
  (feed-forward, with 1-bit carries) and the next section-start row loads
  the working state from it; each message-start row loads the IV;
* the message schedule is a 17-slot sliding window of word columns with
  bit views of slots 2 and 15 for σ1/σ0;
* every mod-2^32 addition carries small carry-bit columns.

STATEMENT BINDING: the message words and claimed digests live in
preprocessed (constant) columns — `mword` streams w[r] under `sel_mload`,
`dig0..dig7` hold the digest words at each message's digest row under
`sel_digest`.  The verifier derives the constants commitment from the
statement itself (`preprocess()` is verifier-side), so a proof only
verifies against the exact (messages, digests) it was built for.  This
replaces per-row boundary constraints, whose (B, N) batched evaluation
would blow up quadratically for large batches.
"""

from __future__ import annotations

import numpy as np

from vectorx_tpu.stark.air import Air

ROUNDS = 64
SECTION = 65  # 64 round rows + post-state/handoff row

_K = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2]

_IV = [0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
       0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19]


def sha256_pad(msg: bytes) -> bytes:
    """Standard SHA-256 padding to a whole number of 64-byte blocks."""
    bitlen = len(msg) * 8
    out = msg + b"\x80"
    out += b"\x00" * ((56 - len(out) % 64) % 64)
    return out + bitlen.to_bytes(8, "big")


# ---------------------------------------------------------------------------
# column layout
# ---------------------------------------------------------------------------

def _layout():
    names = []
    for fam in ("A", "B", "C", "E", "F", "G"):
        names += [f"{fam}{i}" for i in range(32)]
    names += ["Dw", "Hw"]
    names += [f"W{k}" for k in range(17)]
    names += [f"WB2_{i}" for i in range(32)]
    names += [f"WB15_{i}" for i in range(32)]
    names += [f"CA{i}" for i in range(3)]
    names += [f"CE{i}" for i in range(3)]
    names += [f"CW{i}" for i in range(2)]
    names += [f"H{i}" for i in range(8)]      # chaining value
    names += [f"CH{i}" for i in range(8)]     # feed-forward carry bits
    return {n: i for i, n in enumerate(names)}

_COLS = _layout()
WIDTH = len(_COLS)

_CONST_NAMES = ["K", "sel_round", "sel_schedule", "sel_shift",
                "sel_state", "sel_wbits", "sel_handoff",
                "sel_secstart", "sel_hcopy",
                # statement-binding columns (see module docstring)
                "sel_mload", "sel_msgstart", "sel_digest", "mword",
                *[f"dig{i}" for i in range(8)]]
_CONST = {n: i for i, n in enumerate(_CONST_NAMES)}
N_CONST = len(_CONST)


def _as_messages(messages) -> list[bytes]:
    if isinstance(messages, (bytes, bytearray)):
        return [bytes(messages)]
    return [bytes(m) for m in messages]


def _fam(cols, fam):
    base = _COLS[f"{fam}0"]
    return cols[base:base + 32]


class Sha256Air(Air):
    """Full SHA-256 of a batch of messages (any number of 64-byte blocks
    each).  Pass a single `bytes` or a list of them.

    `bind` selects how the statement is bound:
    * "consts" (default): message words + digests live in preprocessed
      columns — the verifier must know them to derive the constants
      commitment (cheap for large batches, but the data is public).
    * "public": the preprocessed columns carry only the SHAPE (selector
      layout); message words and digests are public inputs bound by
      boundary constraints.  Inside the recursion aggregator those publics
      can be WIRED to internal tape values (shadow.verifier_tape
      public_handles), hiding them from the final verifier — the building
      block for succinct composition."""

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

    def _shape(self):
        """Per-message block lists, section-start bases, and trace size."""
        assert self.messages
        self.msg_blocks = []
        self.bases = []
        row = 0
        for msg in self.messages:
            padded = sha256_pad(msg)
            blocks = [padded[i:i + 64] for i in range(0, len(padded), 64)]
            self.msg_blocks.append(blocks)
            self.bases.append(row)
            row += SECTION * len(blocks) + 1   # sections + digest row
        self.total_rows = row
        # n ≥ total_rows + 1 keeps every digest row out of the masked
        # last transition row
        self._log_n = max(7, self.total_rows.bit_length())

    @property
    def message(self) -> bytes:
        assert len(self.messages) == 1
        return self.messages[0]

    @property
    def blocks(self) -> list[bytes]:
        assert len(self.messages) == 1
        return self.msg_blocks[0]

    @property
    def num_blocks(self) -> int:
        return sum(len(b) for b in self.msg_blocks)

    # -- reference computation (also the witness) ---------------------------

    @staticmethod
    def _rotr(x, n):
        return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF

    def _sig0(self, x):
        return (self._rotr(x, 7) ^ self._rotr(x, 18) ^ (x >> 3)) & 0xFFFFFFFF

    def _sig1(self, x):
        return (self._rotr(x, 17) ^ self._rotr(x, 19) ^ (x >> 10)) & 0xFFFFFFFF

    def _run(self):
        self._per_msg = []   # per message: (section_w, section_states, chains)
        self.digests = []
        for blocks in self.msg_blocks:
            h = list(_IV)
            chains = [list(h)]
            section_w = []
            section_states = []
            for blk in blocks:
                w = [int.from_bytes(blk[4 * i:4 * i + 4], "big")
                     for i in range(16)]
                for i in range(16, 64):
                    w.append((w[i - 16] + self._sig0(w[i - 15]) + w[i - 7]
                              + self._sig1(w[i - 2])) & 0xFFFFFFFF)
                section_w.append(w)
                a, b, c, d, e, f, g, hh = h
                states = [(a, b, c, d, e, f, g, hh)]
                for r in range(64):
                    S1 = self._rotr(e, 6) ^ self._rotr(e, 11) \
                        ^ self._rotr(e, 25)
                    ch = ((e & f) ^ ((~e) & g)) & 0xFFFFFFFF
                    t1 = (hh + S1 + ch + _K[r] + w[r]) & 0xFFFFFFFF
                    S0 = self._rotr(a, 2) ^ self._rotr(a, 13) \
                        ^ self._rotr(a, 22)
                    maj = ((a & b) ^ (a & c) ^ (b & c)) & 0xFFFFFFFF
                    t2 = (S0 + maj) & 0xFFFFFFFF
                    hh, g, f, e, d, c, b, a = (g, f, e,
                                               (d + t1) & 0xFFFFFFFF,
                                               c, b, a,
                                               (t1 + t2) & 0xFFFFFFFF)
                    states.append((a, b, c, d, e, f, g, hh))
                section_states.append(states)
                h = [(hv + sv) & 0xFFFFFFFF for hv, sv in zip(h, states[64])]
                chains.append(list(h))
            self._per_msg.append((section_w, section_states, chains))
            self.digests.append(list(h))

    @property
    def digest(self) -> list[int]:
        assert len(self.digests) == 1
        return self.digests[0]

    def digest_bytes(self) -> bytes:
        return b"".join(int.to_bytes(x, 4, "big") for x in self.digest)

    def digest_bytes_list(self) -> list[bytes]:
        return [b"".join(int.to_bytes(x, 4, "big") for x in d)
                for d in self.digests]

    @classmethod
    def statement(cls, messages, claimed_digests) -> "Sha256Air":
        """Verifier-side construction: the STATEMENT (messages + claimed
        digests) without computing any hash — verification must not need to
        re-hash, only to check the proof against this statement.  Accepts
        a single message + 32-byte digest or parallel lists."""
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
        self.digests = [
            [int.from_bytes(d[4 * i:4 * i + 4], "big") for i in range(8)]
            for d in claimed_digests]
        self._per_msg = None   # statement-only: no witness data
        return self

    @classmethod
    def public_shape(cls, block_counts: list[int]) -> "Sha256Air":
        """Verifier-side construction for bind="public": only the SHAPE
        (blocks per message) is statement data; message words and digests
        arrive through the public inputs (typically wired tape handles —
        see shadow.verifier_tape).  public_inputs() returns placeholders
        and must be overridden by wiring."""
        self = object.__new__(cls)
        self.bind = "public"
        self.messages = None
        self.msg_blocks = [[None] * k for k in block_counts]
        self.bases = []
        row = 0
        for k in block_counts:
            self.bases.append(row)
            row += SECTION * k + 1
        self.total_rows = row
        self._log_n = max(7, self.total_rows.bit_length())
        Air.__init__(self, width=WIDTH, log_n=self._log_n,
                     constraint_degree=4)
        self.digests = None
        self._per_msg = None
        return self

    # -- AIR interface ------------------------------------------------------

    def public_inputs(self):
        if self.bind == "public":
            # shape count + per message: 16 words per padded block, then
            # the 8 digest words; real values are supplied by wiring
            out = [len(self.msg_blocks)]
            for mi, blocks in enumerate(self.msg_blocks):
                if self.messages is not None:
                    for blk in blocks:
                        out += [int.from_bytes(blk[4 * r:4 * r + 4], "big")
                                for r in range(16)]
                    out += self.digests[mi]
                else:
                    out += [0] * (16 * len(blocks) + 8)
            return out
        # bind == "consts": the statement lives in the preprocessed
        # columns; the constants cap binds it into the transcript
        return [len(self.messages)]

    def constant_columns(self):
        cols = np.zeros((N_CONST, self.n), dtype=np.uint64)
        for mi, blocks in enumerate(self.msg_blocks):
            mbase = self.bases[mi]
            for s, blk in enumerate(blocks):
                base = mbase + s * SECTION
                for r in range(64):
                    cols[_CONST["K"], base + r] = _K[r]
                    cols[_CONST["sel_round"], base + r] = 1
                    if r >= 16:
                        cols[_CONST["sel_schedule"], base + r] = 1
                        cols[_CONST["sel_wbits"], base + r] = 1
                for r in range(63):
                    cols[_CONST["sel_shift"], base + r] = 1
                for r in range(65):
                    cols[_CONST["sel_state"], base + r] = 1
                cols[_CONST["sel_handoff"], base + 64] = 1
                cols[_CONST["sel_secstart"], base] = 1
                # H constant within the section (rows base..base+63)
                for r in range(64):
                    cols[_CONST["sel_hcopy"], base + r] = 1
                if self.bind == "consts":
                    # message words streamed into W0 over the first 16 rows
                    for r in range(16):
                        cols[_CONST["sel_mload"], base + r] = 1
                        cols[_CONST["mword"], base + r] = int.from_bytes(
                            blk[4 * r:4 * r + 4], "big")
            cols[_CONST["sel_msgstart"], mbase] = 1
            if self.bind == "consts":
                drow = mbase + SECTION * len(blocks)
                cols[_CONST["sel_digest"], drow] = 1
                for i in range(8):
                    cols[_CONST[f"dig{i}"], drow] = self.digests[mi][i]
        return cols

    def boundaries(self, public):
        if self.bind != "public":
            return []
        out = []
        idx = 1  # public[0] = message count
        for mi, blocks in enumerate(self.msg_blocks):
            mbase = self.bases[mi]
            for s in range(len(blocks)):
                base = mbase + s * SECTION
                for r in range(16):
                    out.append((base + r, _COLS["W0"], public[idx]))
                    idx += 1
            drow = mbase + SECTION * len(blocks)
            for i in range(8):
                out.append((drow, _COLS[f"H{i}"], public[idx]))
                idx += 1
        return out

    def transition(self, alg, local, nxt, public, consts=None):
        from vectorx_tpu.stark.air import DeviceAlgebra

        if alg is DeviceAlgebra:
            return self._transition_device(local, nxt, consts)
        one = alg.constant(1)
        two = alg.constant(2)
        k_col = consts[_CONST["K"]]
        sel_round = consts[_CONST["sel_round"]]
        sel_sched = consts[_CONST["sel_schedule"]]
        sel_shift = consts[_CONST["sel_shift"]]
        sel_state = consts[_CONST["sel_state"]]
        sel_wbits = consts[_CONST["sel_wbits"]]
        sel_handoff = consts[_CONST["sel_handoff"]]
        sel_secstart = consts[_CONST["sel_secstart"]]
        sel_hcopy = consts[_CONST["sel_hcopy"]]

        def gate(sel, expr):
            return alg.mul(sel, expr)

        def boolean(sel, b):
            return gate(sel, alg.mul(b, alg.sub(b, one)))

        def word(bits):
            acc = None
            for i, b in enumerate(bits):
                t = alg.mul(alg.constant(1 << i), b)
                acc = t if acc is None else alg.add(acc, t)
            return acc

        def xor3(x, y, z):
            # degree-3 expansion: x+y+z − 2(xy+yz+zx) + 4xyz
            s = alg.add(alg.add(x, y), z)
            p = alg.add(alg.add(alg.mul(x, y), alg.mul(y, z)), alg.mul(z, x))
            xyz = alg.mul(alg.mul(x, y), z)
            return alg.add(alg.sub(s, alg.mul(two, p)),
                           alg.mul(alg.constant(4), xyz))

        A = _fam(local, "A"); B = _fam(local, "B"); C = _fam(local, "C")
        E = _fam(local, "E"); F = _fam(local, "F"); G = _fam(local, "G")
        An = _fam(nxt, "A"); Bn = _fam(nxt, "B"); Cn = _fam(nxt, "C")
        En = _fam(nxt, "E"); Fn = _fam(nxt, "F"); Gn = _fam(nxt, "G")
        Dw = local[_COLS["Dw"]]; Hw = local[_COLS["Hw"]]
        Dwn = nxt[_COLS["Dw"]]; Hwn = nxt[_COLS["Hw"]]
        W = [local[_COLS[f"W{k}"]] for k in range(17)]
        Wn = [nxt[_COLS[f"W{k}"]] for k in range(17)]
        WB2 = [local[_COLS[f"WB2_{i}"]] for i in range(32)]
        WB15 = [local[_COLS[f"WB15_{i}"]] for i in range(32)]
        CA = [local[_COLS[f"CA{i}"]] for i in range(3)]
        CE = [local[_COLS[f"CE{i}"]] for i in range(3)]
        CW = [local[_COLS[f"CW{i}"]] for i in range(2)]
        H = [local[_COLS[f"H{i}"]] for i in range(8)]
        Hn = [nxt[_COLS[f"H{i}"]] for i in range(8)]
        CH = [local[_COLS[f"CH{i}"]] for i in range(8)]

        out = []

        # --- booleanity ----------------------------------------------------
        for fam in (A, B, C, E, F, G):
            for b in fam:
                out.append(boolean(sel_state, b))
        for b in (*WB2, *WB15):
            out.append(boolean(sel_wbits, b))
        for b in (*CA, *CE):
            out.append(boolean(sel_round, b))
        for b in CW:
            out.append(boolean(sel_sched, b))
        for b in CH:
            out.append(boolean(sel_handoff, b))

        # --- round function ------------------------------------------------
        S1 = word([xor3(E[(i + 6) % 32], E[(i + 11) % 32], E[(i + 25) % 32])
                   for i in range(32)])
        Ch = word([alg.add(alg.mul(E[i], F[i]),
                           alg.mul(alg.sub(one, E[i]), G[i]))
                   for i in range(32)])
        S0 = word([xor3(A[(i + 2) % 32], A[(i + 13) % 32], A[(i + 22) % 32])
                   for i in range(32)])
        Maj = word([alg.sub(
            alg.add(alg.add(alg.mul(A[i], B[i]), alg.mul(A[i], C[i])),
                    alg.mul(B[i], C[i])),
            alg.mul(two, alg.mul(alg.mul(A[i], B[i]), C[i])))
            for i in range(32)])
        T1 = alg.add(alg.add(alg.add(Hw, S1), alg.add(Ch, k_col)), W[0])
        T2 = alg.add(S0, Maj)
        pow32 = alg.constant(1 << 32)
        lhs_a = alg.add(word(An), alg.mul(pow32, word(CA)))
        out.append(gate(sel_round, alg.sub(lhs_a, alg.add(T1, T2))))
        lhs_e = alg.add(word(En), alg.mul(pow32, word(CE)))
        out.append(gate(sel_round, alg.sub(lhs_e, alg.add(Dw, T1))))
        # pipeline copies in blocked order (must match _transition_device's
        # constraint emission order — the α powers pair by index)
        for Xn, X in ((Bn, A), (Cn, B), (Fn, E), (Gn, F)):
            for i in range(32):
                out.append(gate(sel_round, alg.sub(Xn[i], X[i])))
        out.append(gate(sel_round, alg.sub(Dwn, word(C))))
        out.append(gate(sel_round, alg.sub(Hwn, word(G))))

        # --- schedule window ----------------------------------------------
        for k in range(1, 17):
            out.append(gate(sel_shift, alg.sub(Wn[k], W[k - 1])))
        out.append(gate(sel_wbits, alg.sub(word(WB2), W[2])))
        out.append(gate(sel_wbits, alg.sub(word(WB15), W[15])))
        zero = alg.constant(0)
        sig1 = word([xor3(WB2[(i + 17) % 32], WB2[(i + 19) % 32],
                          WB2[i + 10] if i + 10 < 32 else zero)
                     for i in range(32)])
        sig0 = word([xor3(WB15[(i + 7) % 32], WB15[(i + 18) % 32],
                          WB15[i + 3] if i + 3 < 32 else zero)
                     for i in range(32)])
        lhs_w = alg.add(W[0], alg.mul(pow32, word(CW)))
        rhs_w = alg.add(alg.add(sig1, W[7]), alg.add(sig0, W[16]))
        out.append(gate(sel_sched, alg.sub(lhs_w, rhs_w)))

        # --- chaining ------------------------------------------------------
        # H constant inside a section
        for i in range(8):
            out.append(gate(sel_hcopy, alg.sub(Hn[i], H[i])))
        # handoff (post-state row): next.H_i + carry·2^32 = H_i + state_i
        state_words = [word(A), word(B), word(C), Dw,
                       word(E), word(F), word(G), Hw]
        for i in range(8):
            lhs = alg.add(Hn[i], alg.mul(pow32, CH[i]))
            out.append(gate(sel_handoff,
                            alg.sub(lhs, alg.add(H[i], state_words[i]))))
        # section start: working state loads the chain value
        for i, sw in enumerate(state_words):
            out.append(gate(sel_secstart, alg.sub(sw, H[i])))

        # statement binding: message words stream into W0, the chain loads
        # the IV at message starts, the digest row pins the chain against
        # the preprocessed digest columns
        out.append(gate(consts[_CONST["sel_mload"]],
                        alg.sub(W[0], consts[_CONST["mword"]])))
        for i in range(8):
            out.append(gate(consts[_CONST["sel_msgstart"]],
                            alg.sub(H[i], alg.constant(_IV[i]))))
        for i in range(8):
            out.append(gate(consts[_CONST["sel_digest"]],
                            alg.sub(H[i], consts[_CONST[f"dig{i}"]])))

        return out

    def _transition_device(self, local, nxt, consts):
        """Vectorized device evaluation of the same constraints: each bit
        family is a stacked (32, N) array; rotations are jnp.roll on the
        bit axis; word sums are one weighted reduction.  Cuts ~100k eager
        dispatches to a few hundred stacked ops."""
        import jax.numpy as jnp

        from vectorx_tpu.field import goldilocks as gl

        def stack_fam(cols, fam):
            base = _COLS[f"{fam}0"]
            return (jnp.stack([cols[base + i][0] for i in range(32)]),
                    jnp.stack([cols[base + i][1] for i in range(32)]))

        def stack_cols(cols, names):
            return (jnp.stack([cols[_COLS[nm]][0] for nm in names]),
                    jnp.stack([cols[_COLS[nm]][1] for nm in names]))

        POW = np.array([1 << i for i in range(32)], dtype=np.uint64)
        POWL = (POW & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None]
        POWH = (POW >> np.uint64(32)).astype(np.uint32)[:, None]

        def word(bits):
            bl, bh = bits
            tl, th = gl.mul(bl, bh, POWL[:bl.shape[0]], POWH[:bl.shape[0]])
            # tree-reduce over the bit axis
            while tl.shape[0] > 1:
                half = tl.shape[0] // 2
                sl, sh = gl.add(tl[:half], th[:half],
                                tl[half:2 * half], th[half:2 * half])
                if tl.shape[0] % 2:
                    sl = jnp.concatenate([sl, tl[-1:]])
                    sh = jnp.concatenate([sh, th[-1:]])
                tl, th = sl, sh
            return tl[0], th[0]

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

        def xor3(x, y, z):
            s = add(add(x, y), z)
            p = add(add(mul(x, y), mul(y, z)), mul(z, x))
            xyz = mul(mul(x, y), z)
            return add(sub(s, cmul(2, p)), cmul(4, xyz))

        def roll(bits, n):
            # result bit i = input bit (i+n) % 32
            return (jnp.roll(bits[0], -n, axis=0), jnp.roll(bits[1], -n, axis=0))

        def shr(bits, n):
            # result bit i = input bit i+n (0 beyond 31)
            zl = jnp.zeros_like(bits[0][:n])
            return (jnp.concatenate([bits[0][n:], zl]),
                    jnp.concatenate([bits[1][n:], zl]))

        k_col = consts[_CONST["K"]]
        sels = {nm: consts[_CONST[nm]] for nm in _CONST}

        def gate(sel_name, expr):
            s = sels[sel_name]
            return mul((s[0], s[1]), expr)

        def gate_rows(sel_name, rows):
            """Gate a stacked (m, N) expression; returns list of pairs."""
            s = sels[sel_name]
            gl_, gh_ = gl.mul(rows[0], rows[1], s[0][None, :], s[1][None, :])
            return [(gl_[i], gh_[i]) for i in range(gl_.shape[0])]

        A = stack_fam(local, "A"); B = stack_fam(local, "B")
        C = stack_fam(local, "C"); E = stack_fam(local, "E")
        F = stack_fam(local, "F"); G = stack_fam(local, "G")
        An = stack_fam(nxt, "A"); Bn = stack_fam(nxt, "B")
        Cn = stack_fam(nxt, "C"); En = stack_fam(nxt, "E")
        Fn = stack_fam(nxt, "F"); Gn = stack_fam(nxt, "G")
        Dw = local[_COLS["Dw"]]; Hw = local[_COLS["Hw"]]
        Dwn = nxt[_COLS["Dw"]]; Hwn = nxt[_COLS["Hw"]]
        W = [local[_COLS[f"W{k}"]] for k in range(17)]
        Wn = [nxt[_COLS[f"W{k}"]] for k in range(17)]
        WB2 = stack_cols(local, [f"WB2_{i}" for i in range(32)])
        WB15 = stack_cols(local, [f"WB15_{i}" for i in range(32)])
        CA = stack_cols(local, [f"CA{i}" for i in range(3)])
        CE = stack_cols(local, [f"CE{i}" for i in range(3)])
        CW = stack_cols(local, [f"CW{i}" for i in range(2)])
        H = [local[_COLS[f"H{i}"]] for i in range(8)]
        Hn = [nxt[_COLS[f"H{i}"]] for i in range(8)]
        CH = stack_cols(local, [f"CH{i}" for i in range(8)])

        out = []

        def boolean_rows(sel_name, bits):
            onel = jnp.uint32(1)
            m = gl.sub(bits[0], bits[1], onel, jnp.uint32(0))
            sq = gl.mul(bits[0], bits[1], m[0], m[1])
            out.extend(gate_rows(sel_name, sq))

        for fam in (A, B, C, E, F, G):
            boolean_rows("sel_state", fam)
        boolean_rows("sel_wbits", WB2)
        boolean_rows("sel_wbits", WB15)
        boolean_rows("sel_round", CA)
        boolean_rows("sel_round", CE)
        boolean_rows("sel_schedule", CW)
        boolean_rows("sel_handoff", CH)

        # round function
        S1 = word(xor3(roll(E, 6), roll(E, 11), roll(E, 25)))
        one_minus_E = sub((jnp.ones_like(E[0]), jnp.zeros_like(E[1])), E)
        Ch = word(add(mul(E, F), mul(one_minus_E, G)))
        S0 = word(xor3(roll(A, 2), roll(A, 13), roll(A, 22)))
        Maj = word(sub(add(add(mul(A, B), mul(A, C)), mul(B, C)),
                       cmul(2, mul(mul(A, B), C))))
        T1 = add(add(add(Hw, S1), add(Ch, k_col)), W[0])
        T2 = add(S0, Maj)
        ca = word(CA)
        ce = word(CE)
        lhs_a = add(word(An), cmul(1 << 32, ca))
        out.append(gate("sel_round", sub(lhs_a, add(T1, T2))))
        lhs_e = add(word(En), cmul(1 << 32, ce))
        out.append(gate("sel_round", sub(lhs_e, add(Dw, T1))))
        out.extend(gate_rows("sel_round", sub(Bn, A)))
        out.extend(gate_rows("sel_round", sub(Cn, B)))
        out.extend(gate_rows("sel_round", sub(Fn, E)))
        out.extend(gate_rows("sel_round", sub(Gn, F)))
        out.append(gate("sel_round", sub(Dwn, word(C))))
        out.append(gate("sel_round", sub(Hwn, word(G))))

        # schedule
        for k in range(1, 17):
            out.append(gate("sel_shift", sub(Wn[k], W[k - 1])))
        out.append(gate("sel_wbits", sub(word(WB2), W[2])))
        out.append(gate("sel_wbits", sub(word(WB15), W[15])))
        sig1 = word(xor3(roll(WB2, 17), roll(WB2, 19), shr(WB2, 10)))
        sig0 = word(xor3(roll(WB15, 7), roll(WB15, 18), shr(WB15, 3)))
        cw = word(CW)
        lhs_w = add(W[0], cmul(1 << 32, cw))
        rhs_w = add(add(sig1, W[7]), add(sig0, W[16]))
        out.append(gate("sel_schedule", sub(lhs_w, rhs_w)))

        # chaining
        Hs = (jnp.stack([h[0] for h in H]), jnp.stack([h[1] for h in H]))
        Hns = (jnp.stack([h[0] for h in Hn]), jnp.stack([h[1] for h in Hn]))
        out.extend(gate_rows("sel_hcopy", sub(Hns, Hs)))
        state_words = [word(A), word(B), word(C), Dw,
                       word(E), word(F), word(G), Hw]
        sw = (jnp.stack([s[0] for s in state_words]),
              jnp.stack([s[1] for s in state_words]))
        ch_terms = gl.mul(CH[0], CH[1], np.uint32(0), np.uint32(1))  # ·2^32
        lhs_h = gl.add(Hns[0], Hns[1], ch_terms[0], ch_terms[1])
        rhs_h = gl.add(Hs[0], Hs[1], sw[0], sw[1])
        out.extend(gate_rows("sel_handoff",
                             gl.sub(lhs_h[0], lhs_h[1],
                                    rhs_h[0], rhs_h[1])))
        out.extend(gate_rows("sel_secstart", sub(sw, Hs)))

        # statement binding (same emission order as the scalar path)
        out.append(gate("sel_mload", sub(W[0], consts[_CONST["mword"]])))
        ivl, ivh = gl.from_u64(np.array(_IV, dtype=np.uint64))
        e_ms = gl.sub(Hs[0], Hs[1], jnp.asarray(ivl)[:, None],
                      jnp.asarray(ivh)[:, None])
        out.extend(gate_rows("sel_msgstart", e_ms))
        digc = (jnp.stack([consts[_CONST[f"dig{i}"]][0] for i in range(8)]),
                jnp.stack([consts[_CONST[f"dig{i}"]][1] for i in range(8)]))
        out.extend(gate_rows("sel_digest", sub(Hs, digc)))

        return out

    # -- witness ------------------------------------------------------------

    def build_trace(self) -> np.ndarray:
        tr = np.zeros((WIDTH, self.n), dtype=np.uint64)
        for mi in range(len(self.messages)):
            self._build_message_trace(tr, mi)
        return tr

    def _build_message_trace(self, tr: np.ndarray, mi: int) -> None:
        section_w, section_states, chains = self._per_msg[mi]
        mbase = self.bases[mi]
        for s in range(len(self.msg_blocks[mi])):
            base = mbase + s * SECTION
            w = section_w[s]
            states = section_states[s]
            chain = chains[s]
            next_chain = chains[s + 1]
            # schedule window
            for r in range(65):
                for k in range(17):
                    if 0 <= r - k < 64:
                        tr[_COLS[f"W{k}"], base + r] = w[r - k]
            for r in range(16, 64):
                for i in range(32):
                    tr[_COLS[f"WB2_{i}"], base + r] = (w[r - 2] >> i) & 1
                    tr[_COLS[f"WB15_{i}"], base + r] = (w[r - 15] >> i) & 1
                total = (self._sig1(w[r - 2]) + w[r - 7]
                         + self._sig0(w[r - 15]) + w[r - 16])
                for i in range(2):
                    tr[_COLS[f"CW{i}"], base + r] = ((total >> 32) >> i) & 1
            # states + carries
            for r in range(65):
                a, b, c, d, e, f, g, h = states[r]
                for fam, val in (("A", a), ("B", b), ("C", c),
                                 ("E", e), ("F", f), ("G", g)):
                    for i in range(32):
                        tr[_COLS[f"{fam}{i}"], base + r] = (val >> i) & 1
                tr[_COLS["Dw"], base + r] = d
                tr[_COLS["Hw"], base + r] = h
            for r in range(64):
                a, b, c, d, e, f, g, h = states[r]
                S1 = self._rotr(e, 6) ^ self._rotr(e, 11) ^ self._rotr(e, 25)
                ch = ((e & f) ^ ((~e) & g)) & 0xFFFFFFFF
                t1f = h + S1 + ch + _K[r] + w[r]
                S0 = self._rotr(a, 2) ^ self._rotr(a, 13) ^ self._rotr(a, 22)
                maj = ((a & b) ^ (a & c) ^ (b & c)) & 0xFFFFFFFF
                ca = (t1f + S0 + maj) >> 32
                ce = (d + t1f) >> 32
                for i in range(3):
                    tr[_COLS[f"CA{i}"], base + r] = (ca >> i) & 1
                    tr[_COLS[f"CE{i}"], base + r] = (ce >> i) & 1
            # chain columns + feed-forward carries at the handoff row
            for r in range(65):
                for i in range(8):
                    tr[_COLS[f"H{i}"], base + r] = chain[i]
            for i in range(8):
                tr[_COLS[f"CH{i}"], base + 64] = \
                    (chain[i] + states[64][i]) >> 32
            # H after handoff (start of next section / the digest row)
            for i in range(8):
                tr[_COLS[f"H{i}"], base + SECTION] = next_chain[i]


# Backwards-compatible name for the single-block compression entry point.
class Sha256CompressAir(Sha256Air):
    def __init__(self, block: bytes):
        assert len(block) == 64
        # bypass padding: treat the block as already padded
        self.bind = "consts"
        self.messages = [block]
        self.msg_blocks = [[block]]
        self.bases = [0]
        self.total_rows = SECTION + 1
        self._log_n = 7
        Air.__init__(self, width=WIDTH, log_n=7, constraint_degree=4)
        self._run()
