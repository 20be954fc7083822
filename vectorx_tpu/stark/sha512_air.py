"""SHA-512 AIR: proves digest_i = SHA512(message_i) for a BATCH of
independent multi-block messages in one trace.

The reference's EdDSA gadget hashes the 53-byte signed precommit with
SHA-512 to derive the challenge scalar h = SHA512(R ‖ A ‖ M) mod L
(curta EdDSA, /root/reference/circuits/builder/justification.rs:237-243);
this AIR is the missing hash half of that statement (VERDICT round-2
item 2).  Wiring: the digest is public, so the verifier reduces it mod L
host-side and feeds the scalar to `ed25519_ladder_air`.

Arithmetization — one round per row, 81-row section per 128-byte block,
plus one digest row per message; the 64-bit variant of `sha256_air`:

* working variables a,b,c and e,f,g are 64 bit-columns each (the 64-bit
  rotations are free bit reindexings; Ch/Maj/Σ/σ are degree ≤ 3 bit
  polynomials); d and h only feed modular adds, so they stay (lo, hi)
  32-bit limb pairs (a full 64-bit word can exceed the Goldilocks
  modulus, so every word value is limb-split — same technique as
  `blake2b_air`);
* mod-2^64 additions split into two 32-bit limb equations with small
  carry-bit columns (≤ 7 terms ⇒ 3-bit carries);
* the chaining value h0..h7 lives in 8 (lo, hi) pairs, copy-constrained
  within a section, feed-forward at the handoff row, IV-loaded at message
  starts;
* the message schedule is a 17-slot sliding window of (lo, hi) pairs with
  bit views of slots 2 and 15 for σ1/σ0;
* K round constants are TWO preprocessed columns (lo, hi) — K values
  exceed the field modulus as single cells.

STATEMENT BINDING: message words and claimed digests live in preprocessed
columns exactly as in `sha256_air` (see its module docstring).
"""

from __future__ import annotations

import numpy as np

from vectorx_tpu.stark.air import Air

ROUNDS = 80
SECTION = 81  # 80 round rows + post-state/handoff row

_K = [
    0x428a2f98d728ae22, 0x7137449123ef65cd, 0xb5c0fbcfec4d3b2f,
    0xe9b5dba58189dbbc, 0x3956c25bf348b538, 0x59f111f1b605d019,
    0x923f82a4af194f9b, 0xab1c5ed5da6d8118, 0xd807aa98a3030242,
    0x12835b0145706fbe, 0x243185be4ee4b28c, 0x550c7dc3d5ffb4e2,
    0x72be5d74f27b896f, 0x80deb1fe3b1696b1, 0x9bdc06a725c71235,
    0xc19bf174cf692694, 0xe49b69c19ef14ad2, 0xefbe4786384f25e3,
    0x0fc19dc68b8cd5b5, 0x240ca1cc77ac9c65, 0x2de92c6f592b0275,
    0x4a7484aa6ea6e483, 0x5cb0a9dcbd41fbd4, 0x76f988da831153b5,
    0x983e5152ee66dfab, 0xa831c66d2db43210, 0xb00327c898fb213f,
    0xbf597fc7beef0ee4, 0xc6e00bf33da88fc2, 0xd5a79147930aa725,
    0x06ca6351e003826f, 0x142929670a0e6e70, 0x27b70a8546d22ffc,
    0x2e1b21385c26c926, 0x4d2c6dfc5ac42aed, 0x53380d139d95b3df,
    0x650a73548baf63de, 0x766a0abb3c77b2a8, 0x81c2c92e47edaee6,
    0x92722c851482353b, 0xa2bfe8a14cf10364, 0xa81a664bbc423001,
    0xc24b8b70d0f89791, 0xc76c51a30654be30, 0xd192e819d6ef5218,
    0xd69906245565a910, 0xf40e35855771202a, 0x106aa07032bbd1b8,
    0x19a4c116b8d2d0c8, 0x1e376c085141ab53, 0x2748774cdf8eeb99,
    0x34b0bcb5e19b48a8, 0x391c0cb3c5c95a63, 0x4ed8aa4ae3418acb,
    0x5b9cca4f7763e373, 0x682e6ff3d6b2b8a3, 0x748f82ee5defb2fc,
    0x78a5636f43172f60, 0x84c87814a1f0ab72, 0x8cc702081a6439ec,
    0x90befffa23631e28, 0xa4506cebde82bde9, 0xbef9a3f7b2c67915,
    0xc67178f2e372532b, 0xca273eceea26619c, 0xd186b8c721c0c207,
    0xeada7dd6cde0eb1e, 0xf57d4f7fee6ed178, 0x06f067aa72176fba,
    0x0a637dc5a2c898a6, 0x113f9804bef90dae, 0x1b710b35131c471b,
    0x28db77f523047d84, 0x32caab7b40c72493, 0x3c9ebe0a15c9bebc,
    0x431d67c49c100d4c, 0x4cc5d4becb3e42b6, 0x597f299cfc657e2a,
    0x5fcb6fab3ad6faec, 0x6c44198c4a475817]

_IV = [0x6a09e667f3bcc908, 0xbb67ae8584caa73b, 0x3c6ef372fe94f82b,
       0xa54ff53a5f1d36f1, 0x510e527fade682d1, 0x9b05688c2b3e6c1f,
       0x1f83d9abfb41bd6b, 0x5be0cd19137e2179]

M64 = (1 << 64) - 1
M32 = 0xFFFFFFFF


def sha512_pad(msg: bytes) -> bytes:
    """Standard SHA-512 padding to whole 128-byte blocks."""
    bitlen = len(msg) * 8
    out = msg + b"\x80"
    out += b"\x00" * ((112 - len(out) % 128) % 128)
    return out + bitlen.to_bytes(16, "big")


# ---------------------------------------------------------------------------
# column layout
# ---------------------------------------------------------------------------

def _layout():
    names = []
    for fam in ("A", "B", "C", "E", "F", "G"):
        names += [f"{fam}{i}" for i in range(64)]
    names += ["Dlo", "Dhi", "Hlo", "Hhi"]
    for k in range(17):
        names += [f"W{k}lo", f"W{k}hi"]
    names += [f"WB2_{i}" for i in range(64)]
    names += [f"WB15_{i}" for i in range(64)]
    names += [f"CA{i}" for i in range(6)]    # a' carries: lo 3 bits, hi 3
    names += [f"CE{i}" for i in range(6)]
    names += [f"CW{i}" for i in range(4)]    # schedule carries: lo 2, hi 2
    for i in range(8):
        names += [f"H{i}lo", f"H{i}hi"]      # chaining value
    names += [f"CH{i}" for i in range(16)]   # feed-forward: lo/hi bit each
    return {n: i for i, n in enumerate(names)}

_COLS = _layout()
WIDTH = len(_COLS)

_CONST_NAMES = ["Klo", "Khi", "sel_round", "sel_schedule", "sel_shift",
                "sel_state", "sel_wbits", "sel_handoff",
                "sel_secstart", "sel_hcopy",
                "sel_mload", "sel_msgstart", "sel_digest",
                "mwlo", "mwhi",
                *[f"dig{i}{p}" for i in range(8) for p in ("lo", "hi")]]
_CONST = {n: i for i, n in enumerate(_CONST_NAMES)}
N_CONST = len(_CONST)


def _as_messages(messages) -> list[bytes]:
    if isinstance(messages, (bytes, bytearray)):
        return [bytes(messages)]
    return [bytes(m) for m in messages]


def _fam(cols, fam):
    base = _COLS[f"{fam}0"]
    return cols[base:base + 64]


class Sha512Air(Air):
    """Full SHA-512 of a batch of messages.  Pass a single `bytes` or a
    list of them."""

    def comp_cache_key(self):
        # device transition reads statement data only through
        # consts/boundary values (traced) - graph shareable by shape
        from vectorx_tpu.stark.air import scalar_attrs_cache_key
        return scalar_attrs_cache_key(self)


    def __init__(self, messages):
        self.messages = _as_messages(messages)
        self._shape()
        super().__init__(width=WIDTH, log_n=self._log_n,
                         constraint_degree=4)
        self._run()

    def _shape(self):
        assert self.messages
        self.msg_blocks = []
        self.bases = []
        row = 0
        for msg in self.messages:
            padded = sha512_pad(msg)
            blocks = [padded[i:i + 128] for i in range(0, len(padded), 128)]
            self.msg_blocks.append(blocks)
            self.bases.append(row)
            row += SECTION * len(blocks) + 1
        self.total_rows = row
        self._log_n = max(7, self.total_rows.bit_length())

    @property
    def num_blocks(self) -> int:
        return sum(len(b) for b in self.msg_blocks)

    # -- reference computation (also the witness) ---------------------------

    @staticmethod
    def _rotr(x, n):
        return ((x >> n) | (x << (64 - n))) & M64

    def _sig0(self, x):
        return (self._rotr(x, 1) ^ self._rotr(x, 8) ^ (x >> 7)) & M64

    def _sig1(self, x):
        return (self._rotr(x, 19) ^ self._rotr(x, 61) ^ (x >> 6)) & M64

    def _cap_s1(self, e):
        return self._rotr(e, 14) ^ self._rotr(e, 18) ^ self._rotr(e, 41)

    def _cap_s0(self, a):
        return self._rotr(a, 28) ^ self._rotr(a, 34) ^ self._rotr(a, 39)

    def _run(self):
        self._per_msg = []
        self.digests = []
        for blocks in self.msg_blocks:
            h = list(_IV)
            chains = [list(h)]
            section_w = []
            section_states = []
            for blk in blocks:
                w = [int.from_bytes(blk[8 * i:8 * i + 8], "big")
                     for i in range(16)]
                for i in range(16, 80):
                    w.append((w[i - 16] + self._sig0(w[i - 15]) + w[i - 7]
                              + self._sig1(w[i - 2])) & M64)
                section_w.append(w)
                a, b, c, d, e, f, g, hh = h
                states = [(a, b, c, d, e, f, g, hh)]
                for r in range(80):
                    S1 = self._cap_s1(e)
                    ch = ((e & f) ^ ((~e) & g)) & M64
                    t1 = (hh + S1 + ch + _K[r] + w[r]) & M64
                    S0 = self._cap_s0(a)
                    maj = ((a & b) ^ (a & c) ^ (b & c)) & M64
                    t2 = (S0 + maj) & M64
                    hh, g, f, e, d, c, b, a = (g, f, e, (d + t1) & M64,
                                               c, b, a, (t1 + t2) & M64)
                    states.append((a, b, c, d, e, f, g, hh))
                section_states.append(states)
                h = [(hv + sv) & M64 for hv, sv in zip(h, states[80])]
                chains.append(list(h))
            self._per_msg.append((section_w, section_states, chains))
            self.digests.append(list(h))

    def digest_bytes_list(self) -> list[bytes]:
        return [b"".join(int.to_bytes(x, 8, "big") for x in d)
                for d in self.digests]

    def digest_bytes(self) -> bytes:
        assert len(self.messages) == 1
        return self.digest_bytes_list()[0]

    @classmethod
    def statement(cls, messages, claimed_digests) -> "Sha512Air":
        """Verifier-side construction — no hashing."""
        self = object.__new__(cls)
        self.messages = _as_messages(messages)
        if isinstance(claimed_digests, (bytes, bytearray)):
            claimed_digests = [bytes(claimed_digests)]
        assert len(claimed_digests) == len(self.messages)
        assert all(len(d) == 64 for d in claimed_digests)
        self._shape()
        Air.__init__(self, width=WIDTH, log_n=self._log_n,
                     constraint_degree=4)
        self.digests = [
            [int.from_bytes(d[8 * i:8 * i + 8], "big") for i in range(8)]
            for d in claimed_digests]
        self._per_msg = None
        return self

    # -- AIR interface ------------------------------------------------------

    def public_inputs(self):
        return [len(self.messages)]

    def constant_columns(self):
        cols = np.zeros((N_CONST, self.n), dtype=np.uint64)
        for mi, blocks in enumerate(self.msg_blocks):
            mbase = self.bases[mi]
            for s, blk in enumerate(blocks):
                base = mbase + s * SECTION
                for r in range(80):
                    cols[_CONST["Klo"], base + r] = _K[r] & M32
                    cols[_CONST["Khi"], base + r] = _K[r] >> 32
                    cols[_CONST["sel_round"], base + r] = 1
                    if r >= 16:
                        cols[_CONST["sel_schedule"], base + r] = 1
                        cols[_CONST["sel_wbits"], base + r] = 1
                for r in range(79):
                    cols[_CONST["sel_shift"], base + r] = 1
                for r in range(81):
                    cols[_CONST["sel_state"], base + r] = 1
                cols[_CONST["sel_handoff"], base + 80] = 1
                cols[_CONST["sel_secstart"], base] = 1
                for r in range(80):
                    cols[_CONST["sel_hcopy"], base + r] = 1
                for r in range(16):
                    mw = int.from_bytes(blk[8 * r:8 * r + 8], "big")
                    cols[_CONST["sel_mload"], base + r] = 1
                    cols[_CONST["mwlo"], base + r] = mw & M32
                    cols[_CONST["mwhi"], base + r] = mw >> 32
            cols[_CONST["sel_msgstart"], mbase] = 1
            drow = mbase + SECTION * len(blocks)
            cols[_CONST["sel_digest"], drow] = 1
            for i in range(8):
                cols[_CONST[f"dig{i}lo"], drow] = self.digests[mi][i] & M32
                cols[_CONST[f"dig{i}hi"], drow] = self.digests[mi][i] >> 32
        return cols

    def boundaries(self, public):
        return []

    def transition(self, alg, local, nxt, public, consts=None):
        from vectorx_tpu.stark.air import DeviceAlgebra

        if alg is DeviceAlgebra:
            return self._transition_device(local, nxt, consts)
        one = alg.constant(1)
        two = alg.constant(2)
        pow32 = alg.constant(1 << 32)
        sels = {nm: consts[_CONST[nm]] for nm in _CONST}

        def gate(sel, expr):
            return alg.mul(sels[sel], expr)

        def boolean(sel, b):
            return gate(sel, alg.mul(b, alg.sub(b, one)))

        def word_lo(bits):
            acc = None
            for i in range(32):
                t = alg.mul(alg.constant(1 << i), bits[i])
                acc = t if acc is None else alg.add(acc, t)
            return acc

        def word_hi(bits):
            acc = None
            for i in range(32):
                t = alg.mul(alg.constant(1 << i), bits[32 + i])
                acc = t if acc is None else alg.add(acc, t)
            return acc

        def xor3(x, y, z):
            s = alg.add(alg.add(x, y), z)
            p = alg.add(alg.add(alg.mul(x, y), alg.mul(y, z)),
                        alg.mul(z, x))
            xyz = alg.mul(alg.mul(x, y), z)
            return alg.add(alg.sub(s, alg.mul(two, p)),
                           alg.mul(alg.constant(4), xyz))

        def add64_eqs(out, sel, res_lo, res_hi, clo_bits, chi_bits,
                      terms):
            """res + carries·2^32 = Σ terms, limb-split; terms are
            (lo, hi) expression pairs."""
            c_lo = None
            for i, b in enumerate(clo_bits):
                t = alg.mul(alg.constant(1 << i), b)
                c_lo = t if c_lo is None else alg.add(c_lo, t)
            c_hi = None
            for i, b in enumerate(chi_bits):
                t = alg.mul(alg.constant(1 << i), b)
                c_hi = t if c_hi is None else alg.add(c_hi, t)
            rhs_lo = terms[0][0]
            rhs_hi = terms[0][1]
            for t in terms[1:]:
                rhs_lo = alg.add(rhs_lo, t[0])
                rhs_hi = alg.add(rhs_hi, t[1])
            lhs_lo = alg.add(res_lo, alg.mul(pow32, c_lo))
            out.append(gate(sel, alg.sub(lhs_lo, rhs_lo)))
            lhs_hi = alg.add(res_hi, alg.mul(pow32, c_hi))
            rhs_hi = alg.add(rhs_hi, c_lo)
            out.append(gate(sel, alg.sub(lhs_hi, rhs_hi)))

        A = _fam(local, "A"); B = _fam(local, "B"); C = _fam(local, "C")
        E = _fam(local, "E"); F = _fam(local, "F"); G = _fam(local, "G")
        An = _fam(nxt, "A"); Bn = _fam(nxt, "B"); Cn = _fam(nxt, "C")
        En = _fam(nxt, "E"); Fn = _fam(nxt, "F"); Gn = _fam(nxt, "G")
        Dp = (local[_COLS["Dlo"]], local[_COLS["Dhi"]])
        Hp = (local[_COLS["Hlo"]], local[_COLS["Hhi"]])
        Dpn = (nxt[_COLS["Dlo"]], nxt[_COLS["Dhi"]])
        Hpn = (nxt[_COLS["Hlo"]], nxt[_COLS["Hhi"]])
        W = [(local[_COLS[f"W{k}lo"]], local[_COLS[f"W{k}hi"]])
             for k in range(17)]
        Wn = [(nxt[_COLS[f"W{k}lo"]], nxt[_COLS[f"W{k}hi"]])
              for k in range(17)]
        WB2 = [local[_COLS[f"WB2_{i}"]] for i in range(64)]
        WB15 = [local[_COLS[f"WB15_{i}"]] for i in range(64)]
        CA = [local[_COLS[f"CA{i}"]] for i in range(6)]
        CE = [local[_COLS[f"CE{i}"]] for i in range(6)]
        CW = [local[_COLS[f"CW{i}"]] for i in range(4)]
        H = [(local[_COLS[f"H{i}lo"]], local[_COLS[f"H{i}hi"]])
             for i in range(8)]
        Hn = [(nxt[_COLS[f"H{i}lo"]], nxt[_COLS[f"H{i}hi"]])
              for i in range(8)]
        CH = [local[_COLS[f"CH{i}"]] for i in range(16)]

        out = []

        # --- booleanity ----------------------------------------------------
        for fam in (A, B, C, E, F, G):
            for b in fam:
                out.append(boolean("sel_state", b))
        for b in (*WB2, *WB15):
            out.append(boolean("sel_wbits", b))
        for b in (*CA, *CE):
            out.append(boolean("sel_round", b))
        for b in CW:
            out.append(boolean("sel_schedule", b))
        for b in CH:
            out.append(boolean("sel_handoff", b))

        # --- round function ------------------------------------------------
        s1b = [xor3(E[(i + 14) % 64], E[(i + 18) % 64], E[(i + 41) % 64])
               for i in range(64)]
        chb = [alg.add(alg.mul(E[i], F[i]),
                       alg.mul(alg.sub(one, E[i]), G[i]))
               for i in range(64)]
        s0b = [xor3(A[(i + 28) % 64], A[(i + 34) % 64], A[(i + 39) % 64])
               for i in range(64)]
        majb = [alg.sub(
            alg.add(alg.add(alg.mul(A[i], B[i]), alg.mul(A[i], C[i])),
                    alg.mul(B[i], C[i])),
            alg.mul(two, alg.mul(alg.mul(A[i], B[i]), C[i])))
            for i in range(64)]
        S1 = (word_lo(s1b), word_hi(s1b))
        Ch = (word_lo(chb), word_hi(chb))
        S0 = (word_lo(s0b), word_hi(s0b))
        Maj = (word_lo(majb), word_hi(majb))
        K = (sels["Klo"], sels["Khi"])
        Awords = (word_lo(A), word_hi(A))
        Bwords = (word_lo(B), word_hi(B))
        Cwords = (word_lo(C), word_hi(C))
        Ewords = (word_lo(E), word_hi(E))
        Fwords = (word_lo(F), word_hi(F))
        Gwords = (word_lo(G), word_hi(G))
        # a' = T1 + T2 = (h + S1 + ch + K + w) + (S0 + maj): 7 terms
        add64_eqs(out, "sel_round", word_lo(An), word_hi(An),
                  CA[:3], CA[3:], [Hp, S1, Ch, K, W[0], S0, Maj])
        # e' = d + T1: 6 terms
        add64_eqs(out, "sel_round", word_lo(En), word_hi(En),
                  CE[:3], CE[3:], [Dp, Hp, S1, Ch, K, W[0]])
        for Xn, X in ((Bn, A), (Cn, B), (Fn, E), (Gn, F)):
            for i in range(64):
                out.append(gate("sel_round", alg.sub(Xn[i], X[i])))
        out.append(gate("sel_round", alg.sub(Dpn[0], Cwords[0])))
        out.append(gate("sel_round", alg.sub(Dpn[1], Cwords[1])))
        out.append(gate("sel_round", alg.sub(Hpn[0], Gwords[0])))
        out.append(gate("sel_round", alg.sub(Hpn[1], Gwords[1])))

        # --- schedule window ----------------------------------------------
        for k in range(1, 17):
            out.append(gate("sel_shift", alg.sub(Wn[k][0], W[k - 1][0])))
            out.append(gate("sel_shift", alg.sub(Wn[k][1], W[k - 1][1])))
        out.append(gate("sel_wbits", alg.sub(word_lo(WB2), W[2][0])))
        out.append(gate("sel_wbits", alg.sub(word_hi(WB2), W[2][1])))
        out.append(gate("sel_wbits", alg.sub(word_lo(WB15), W[15][0])))
        out.append(gate("sel_wbits", alg.sub(word_hi(WB15), W[15][1])))
        zero = alg.constant(0)
        sig1b = [xor3(WB2[(i + 19) % 64], WB2[(i + 61) % 64],
                      WB2[i + 6] if i + 6 < 64 else zero)
                 for i in range(64)]
        sig0b = [xor3(WB15[(i + 1) % 64], WB15[(i + 8) % 64],
                      WB15[i + 7] if i + 7 < 64 else zero)
                 for i in range(64)]
        sig1 = (word_lo(sig1b), word_hi(sig1b))
        sig0 = (word_lo(sig0b), word_hi(sig0b))
        add64_eqs(out, "sel_schedule", W[0][0], W[0][1], CW[:2], CW[2:],
                  [sig1, W[7], sig0, W[16]])

        # --- chaining ------------------------------------------------------
        for i in range(8):
            out.append(gate("sel_hcopy", alg.sub(Hn[i][0], H[i][0])))
            out.append(gate("sel_hcopy", alg.sub(Hn[i][1], H[i][1])))
        state_words = [Awords, Bwords, Cwords, Dp,
                       Ewords, Fwords, Gwords, Hp]
        for i in range(8):
            add64_eqs(out, "sel_handoff", Hn[i][0], Hn[i][1],
                      [CH[2 * i]], [CH[2 * i + 1]],
                      [H[i], state_words[i]])
        for i, sw in enumerate(state_words):
            out.append(gate("sel_secstart", alg.sub(sw[0], H[i][0])))
            out.append(gate("sel_secstart", alg.sub(sw[1], H[i][1])))

        # --- statement binding ---------------------------------------------
        out.append(gate("sel_mload", alg.sub(W[0][0], sels["mwlo"])))
        out.append(gate("sel_mload", alg.sub(W[0][1], sels["mwhi"])))
        for i in range(8):
            out.append(gate("sel_msgstart",
                            alg.sub(H[i][0], alg.constant(_IV[i] & M32))))
            out.append(gate("sel_msgstart",
                            alg.sub(H[i][1], alg.constant(_IV[i] >> 32))))
        for i in range(8):
            out.append(gate("sel_digest",
                            alg.sub(H[i][0], sels[f"dig{i}lo"])))
            out.append(gate("sel_digest",
                            alg.sub(H[i][1], sels[f"dig{i}hi"])))

        return out
    def _transition_device(self, local, nxt, consts):
        """Vectorized device path — identical constraints and emission
        order to the scalar path.  A 64-bit WORD here is a pair
        (lo, hi) of field values, each itself a (l, h) uint32 array
        pair; bit families are stacked (64, N) arrays."""
        import jax.numpy as jnp

        from vectorx_tpu.field import goldilocks as gl

        def stack_fam(cols, fam):
            base = _COLS[f"{fam}0"]
            return (jnp.stack([cols[base + i][0] for i in range(64)]),
                    jnp.stack([cols[base + i][1] for i in range(64)]))

        def stack_cols(cols, names):
            return (jnp.stack([cols[_COLS[nm]][0] for nm in names]),
                    jnp.stack([cols[_COLS[nm]][1] for nm in names]))

        POW = np.array([1 << i for i in range(32)], dtype=np.uint64)
        PL = (POW & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None]
        PH = (POW >> np.uint64(32)).astype(np.uint32)[:, None]

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

        def halfword(bl, bh):
            tl, th = gl.mul(bl, bh, PL[:bl.shape[0]], PH[:bl.shape[0]])
            while tl.shape[0] > 1:
                half = tl.shape[0] // 2
                sl, sh = gl.add(tl[:half], th[:half],
                                tl[half:2 * half], th[half:2 * half])
                if tl.shape[0] % 2:
                    sl = jnp.concatenate([sl, tl[-1:]])
                    sh = jnp.concatenate([sh, th[-1:]])
                tl, th = sl, sh
            return tl[0], th[0]

        def word64(bits):
            return (halfword(bits[0][:32], bits[1][:32]),
                    halfword(bits[0][32:], bits[1][32:]))

        def xor3(x, y, z):
            s = add(add(x, y), z)
            p = add(add(mul(x, y), mul(y, z)), mul(z, x))
            xyz = mul(mul(x, y), z)
            return add(sub(s, cmul(2, p)), cmul(4, xyz))

        def roll(bits, n):
            return (jnp.roll(bits[0], -n, axis=0),
                    jnp.roll(bits[1], -n, axis=0))

        def shr(bits, n):
            zl = jnp.zeros_like(bits[0][:n])
            return (jnp.concatenate([bits[0][n:], zl]),
                    jnp.concatenate([bits[1][n:], zl]))

        sels = {nm: consts[_CONST[nm]] for nm in _CONST}
        out = []

        def gate(sel_name, expr):
            s = sels[sel_name]
            return mul(s, expr)

        def gate_rows(sel_name, rows):
            s = sels[sel_name]
            gl_, gh_ = gl.mul(rows[0], rows[1], s[0][None, :],
                              s[1][None, :])
            return [(gl_[i], gh_[i]) for i in range(gl_.shape[0])]

        A = stack_fam(local, "A"); B = stack_fam(local, "B")
        C = stack_fam(local, "C"); E = stack_fam(local, "E")
        F = stack_fam(local, "F"); G = stack_fam(local, "G")
        An = stack_fam(nxt, "A"); Bn = stack_fam(nxt, "B")
        Cn = stack_fam(nxt, "C"); En = stack_fam(nxt, "E")
        Fn = stack_fam(nxt, "F"); Gn = stack_fam(nxt, "G")
        Dw = (local[_COLS["Dlo"]], local[_COLS["Dhi"]])
        Hw = (local[_COLS["Hlo"]], local[_COLS["Hhi"]])
        Dwn = (nxt[_COLS["Dlo"]], nxt[_COLS["Dhi"]])
        Hwn = (nxt[_COLS["Hlo"]], nxt[_COLS["Hhi"]])
        W = [(local[_COLS[f"W{k}lo"]], local[_COLS[f"W{k}hi"]])
             for k in range(17)]
        Wn = [(nxt[_COLS[f"W{k}lo"]], nxt[_COLS[f"W{k}hi"]])
              for k in range(17)]
        WB2 = stack_cols(local, [f"WB2_{i}" for i in range(64)])
        WB15 = stack_cols(local, [f"WB15_{i}" for i in range(64)])
        CA = stack_cols(local, [f"CA{i}" for i in range(6)])
        CE = stack_cols(local, [f"CE{i}" for i in range(6)])
        CW = stack_cols(local, [f"CW{i}" for i in range(4)])
        CH = stack_cols(local, [f"CH{i}" for i in range(16)])

        def boolean_rows(sel_name, bits):
            m = gl.sub(bits[0], bits[1], jnp.uint32(1), jnp.uint32(0))
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

        one_minus_E = sub((jnp.ones_like(E[0]), jnp.zeros_like(E[1])), E)
        S1 = word64(xor3(roll(E, 14), roll(E, 18), roll(E, 41)))
        Ch = word64(add(mul(E, F), mul(one_minus_E, G)))
        S0 = word64(xor3(roll(A, 28), roll(A, 34), roll(A, 39)))
        Maj = word64(sub(add(add(mul(A, B), mul(A, C)), mul(B, C)),
                         cmul(2, mul(mul(A, B), C))))
        K = (sels["Klo"], sels["Khi"])
        Aw = word64(A); Bw = word64(B); Cw = word64(C)
        Ew = word64(E); Fw = word64(F); Gw = word64(G)

        def carry_val(bl, bh):
            acc = (bl[0], bh[0])
            for i in range(1, bl.shape[0]):
                acc = add(acc, cmul(1 << i, (bl[i], bh[i])))
            return acc

        def add64_dev(sel_name, res_word, clo, chi, terms):
            c_lo = carry_val(*clo)
            c_hi = carry_val(*chi)
            rhs_lo = terms[0][0]
            rhs_hi = terms[0][1]
            for t in terms[1:]:
                rhs_lo = add(rhs_lo, t[0])
                rhs_hi = add(rhs_hi, t[1])
            lhs_lo = add(res_word[0], cmul(1 << 32, c_lo))
            out.append(gate(sel_name, sub(lhs_lo, rhs_lo)))
            lhs_hi = add(res_word[1], cmul(1 << 32, c_hi))
            out.append(gate(sel_name, sub(lhs_hi, add(rhs_hi, c_lo))))

        add64_dev("sel_round", word64(An),
                  (CA[0][:3], CA[1][:3]), (CA[0][3:], CA[1][3:]),
                  [Hw, S1, Ch, K, W[0], S0, Maj])
        add64_dev("sel_round", word64(En),
                  (CE[0][:3], CE[1][:3]), (CE[0][3:], CE[1][3:]),
                  [Dw, Hw, S1, Ch, K, W[0]])
        out.extend(gate_rows("sel_round", sub(Bn, A)))
        out.extend(gate_rows("sel_round", sub(Cn, B)))
        out.extend(gate_rows("sel_round", sub(Fn, E)))
        out.extend(gate_rows("sel_round", sub(Gn, F)))
        out.append(gate("sel_round", sub(Dwn[0], Cw[0])))
        out.append(gate("sel_round", sub(Dwn[1], Cw[1])))
        out.append(gate("sel_round", sub(Hwn[0], Gw[0])))
        out.append(gate("sel_round", sub(Hwn[1], Gw[1])))

        # schedule
        for k in range(1, 17):
            out.append(gate("sel_shift", sub(Wn[k][0], W[k - 1][0])))
            out.append(gate("sel_shift", sub(Wn[k][1], W[k - 1][1])))
        wb2w = word64(WB2)
        wb15w = word64(WB15)
        out.append(gate("sel_wbits", sub(wb2w[0], W[2][0])))
        out.append(gate("sel_wbits", sub(wb2w[1], W[2][1])))
        out.append(gate("sel_wbits", sub(wb15w[0], W[15][0])))
        out.append(gate("sel_wbits", sub(wb15w[1], W[15][1])))
        sig1 = word64(xor3(roll(WB2, 19), roll(WB2, 61), shr(WB2, 6)))
        sig0 = word64(xor3(roll(WB15, 1), roll(WB15, 8), shr(WB15, 7)))
        add64_dev("sel_schedule", W[0],
                  (CW[0][:2], CW[1][:2]), (CW[0][2:], CW[1][2:]),
                  [sig1, W[7], sig0, W[16]])

        # chaining
        H = [(local[_COLS[f"H{i}lo"]], local[_COLS[f"H{i}hi"]])
             for i in range(8)]
        Hn = [(nxt[_COLS[f"H{i}lo"]], nxt[_COLS[f"H{i}hi"]])
              for i in range(8)]
        for i in range(8):
            out.append(gate("sel_hcopy", sub(Hn[i][0], H[i][0])))
            out.append(gate("sel_hcopy", sub(Hn[i][1], H[i][1])))
        state_words = [Aw, Bw, Cw, Dw, Ew, Fw, Gw, Hw]
        for i in range(8):
            add64_dev("sel_handoff", Hn[i],
                      (CH[0][2 * i:2 * i + 1], CH[1][2 * i:2 * i + 1]),
                      (CH[0][2 * i + 1:2 * i + 2],
                       CH[1][2 * i + 1:2 * i + 2]),
                      [H[i], state_words[i]])
        for i, sw in enumerate(state_words):
            out.append(gate("sel_secstart", sub(sw[0], H[i][0])))
            out.append(gate("sel_secstart", sub(sw[1], H[i][1])))

        # statement binding (same order as the scalar path)
        out.append(gate("sel_mload", sub(W[0][0], sels["mwlo"])))
        out.append(gate("sel_mload", sub(W[0][1], sels["mwhi"])))
        for i in range(8):
            ivlo = _IV[i] & M32
            ivhi = _IV[i] >> 32
            out.append(gate("sel_msgstart", gl.sub(
                H[i][0][0], H[i][0][1], np.uint32(ivlo & 0xFFFFFFFF),
                np.uint32(0))))
            out.append(gate("sel_msgstart", gl.sub(
                H[i][1][0], H[i][1][1], np.uint32(ivhi & 0xFFFFFFFF),
                np.uint32(0))))
        for i in range(8):
            out.append(gate("sel_digest", sub(H[i][0], sels[f"dig{i}lo"])))
            out.append(gate("sel_digest", sub(H[i][1], sels[f"dig{i}hi"])))

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
            for r in range(81):
                for k in range(17):
                    if 0 <= r - k < 80:
                        tr[_COLS[f"W{k}lo"], base + r] = w[r - k] & M32
                        tr[_COLS[f"W{k}hi"], base + r] = w[r - k] >> 32
            for r in range(16, 80):
                for i in range(64):
                    tr[_COLS[f"WB2_{i}"], base + r] = (w[r - 2] >> i) & 1
                    tr[_COLS[f"WB15_{i}"], base + r] = (w[r - 15] >> i) & 1
                # schedule carries, limb-split
                lo = ((self._sig1(w[r - 2]) & M32) + (w[r - 7] & M32)
                      + (self._sig0(w[r - 15]) & M32) + (w[r - 16] & M32))
                c_lo = (lo - (w[r] & M32)) >> 32
                hi = ((self._sig1(w[r - 2]) >> 32) + (w[r - 7] >> 32)
                      + (self._sig0(w[r - 15]) >> 32) + (w[r - 16] >> 32)
                      + c_lo)
                c_hi = (hi - (w[r] >> 32)) >> 32
                for i in range(2):
                    tr[_COLS[f"CW{i}"], base + r] = (c_lo >> i) & 1
                    tr[_COLS[f"CW{i + 2}"], base + r] = (c_hi >> i) & 1
            for r in range(81):
                a, b, c, d, e, f, g, h = states[r]
                for fam, val in (("A", a), ("B", b), ("C", c),
                                 ("E", e), ("F", f), ("G", g)):
                    for i in range(64):
                        tr[_COLS[f"{fam}{i}"], base + r] = (val >> i) & 1
                tr[_COLS["Dlo"], base + r] = d & M32
                tr[_COLS["Dhi"], base + r] = d >> 32
                tr[_COLS["Hlo"], base + r] = h & M32
                tr[_COLS["Hhi"], base + r] = h >> 32
            for r in range(80):
                a, b, c, d, e, f, g, h = states[r]
                S1 = self._cap_s1(e)
                ch = ((e & f) ^ ((~e) & g)) & M64
                S0 = self._cap_s0(a)
                maj = ((a & b) ^ (a & c) ^ (b & c)) & M64
                an, _, _, _, en, _, _, _ = states[r + 1]
                # a' carries
                lo = ((h & M32) + (S1 & M32) + (ch & M32)
                      + (_K[r] & M32) + (w[r] & M32) + (S0 & M32)
                      + (maj & M32))
                ca_lo = (lo - (an & M32)) >> 32
                hi = ((h >> 32) + (S1 >> 32) + (ch >> 32) + (_K[r] >> 32)
                      + (w[r] >> 32) + (S0 >> 32) + (maj >> 32) + ca_lo)
                ca_hi = (hi - (an >> 32)) >> 32
                lo = ((d & M32) + (h & M32) + (S1 & M32) + (ch & M32)
                      + (_K[r] & M32) + (w[r] & M32))
                ce_lo = (lo - (en & M32)) >> 32
                hi = ((d >> 32) + (h >> 32) + (S1 >> 32) + (ch >> 32)
                      + (_K[r] >> 32) + (w[r] >> 32) + ce_lo)
                ce_hi = (hi - (en >> 32)) >> 32
                for i in range(3):
                    tr[_COLS[f"CA{i}"], base + r] = (ca_lo >> i) & 1
                    tr[_COLS[f"CA{i + 3}"], base + r] = (ca_hi >> i) & 1
                    tr[_COLS[f"CE{i}"], base + r] = (ce_lo >> i) & 1
                    tr[_COLS[f"CE{i + 3}"], base + r] = (ce_hi >> i) & 1
            for r in range(81):
                for i in range(8):
                    tr[_COLS[f"H{i}lo"], base + r] = chain[i] & M32
                    tr[_COLS[f"H{i}hi"], base + r] = chain[i] >> 32
            # feed-forward carries at the handoff row
            for i in range(8):
                lo = (chain[i] & M32) + (states[80][i] & M32)
                c_lo = (lo - (next_chain[i] & M32)) >> 32
                hi = (chain[i] >> 32) + (states[80][i] >> 32) + c_lo
                c_hi = (hi - (next_chain[i] >> 32)) >> 32
                tr[_COLS[f"CH{2 * i}"], base + 80] = c_lo
                tr[_COLS[f"CH{2 * i + 1}"], base + 80] = c_hi
            # chain after the handoff (next section start / digest row)
            for i in range(8):
                tr[_COLS[f"H{i}lo"], base + SECTION] = next_chain[i] & M32
                tr[_COLS[f"H{i}hi"], base + SECTION] = next_chain[i] >> 32
