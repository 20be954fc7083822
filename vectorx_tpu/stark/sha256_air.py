"""SHA-256 compression-function AIR: proves digest = SHA256Compress(IV, block).

The TPU-native counterpart of the reference's curta SHA-256 STARK gadget
(`curta_sha256`, /root/reference/circuits/builder/justification.rs:140,156 —
SURVEY.md §2 E3): the authority-set chained commitment and the data-root
Merkle interior nodes are chains of exactly this compression.

Arithmetization (one round per row, 64 rounds + post-state row):

* working variables a,b,c and e,f,g live as 32 bit-columns each (rotations
  are free bit reindexings; Ch/Maj/Σ are degree ≤ 3 bit polynomials);
  d and h only ever feed modular adds, so they stay as word columns;
* the message schedule is a 17-slot sliding window of word columns with
  per-row shift constraints; slots 2 and 15 carry bit views for σ1/σ0;
* every mod-2^32 addition gets small carry-bit columns
  (Σ bits·2^i + carry·2^32 = expression);
* round selectors / schedule selectors / K round constants are
  preprocessed columns (the committed verification key).

Public inputs: 16 message words + 8 digest words.  The verifier derives the
row-64 boundary values as (digest_i − IV_i) mod 2^32, binding the digest to
the final working state.
"""

from __future__ import annotations

import hashlib

import numpy as np

from vectorx_tpu.field.goldilocks import P
from vectorx_tpu.stark.air import Air

ROUNDS = 64
N_ROWS = 128  # 64 rounds + post-state row 64 + free padding

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


# ---------------------------------------------------------------------------
# column layout
# ---------------------------------------------------------------------------

def _layout():
    """Column name -> index.  Bit families are 32 consecutive columns."""
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
    return {n: i for i, n in enumerate(names)}

_COLS = _layout()
WIDTH = len(_COLS)

# constant columns
_CONST = {"K": 0, "sel_round": 1, "sel_schedule": 2, "sel_shift": 3,
          "sel_state": 4, "sel_wbits": 5}
N_CONST = len(_CONST)


def _fam(cols, fam):
    base = _COLS[f"{fam}0"]
    return cols[base:base + 32]


class Sha256CompressAir(Air):
    """Single-block SHA-256 compression with the standard IV.

    `message_block` is the 64-byte block (already padded by the caller —
    this AIR proves the compression; multi-block hashing chains it)."""

    def __init__(self, message_block: bytes):
        super().__init__(width=WIDTH, log_n=7, constraint_degree=4)
        assert len(message_block) == 64
        self.block = message_block
        self.msg_words = [int.from_bytes(message_block[4 * i:4 * i + 4],
                                         "big") for i in range(16)]
        self.digest = self._compress()

    def _compress(self) -> list[int]:
        """Reference compression (also yields the round trace)."""
        w = list(self.msg_words)
        for i in range(16, 64):
            s0 = self._sig0(w[i - 15])
            s1 = self._sig1(w[i - 2])
            w.append((w[i - 16] + s0 + w[i - 7] + s1) & 0xFFFFFFFF)
        self._w = w
        a, b, c, d, e, f, g, h = _IV
        self._states = [(a, b, c, d, e, f, g, h)]
        for r in range(64):
            S1 = self._rotr(e, 6) ^ self._rotr(e, 11) ^ self._rotr(e, 25)
            ch = ((e & f) ^ ((~e) & g)) & 0xFFFFFFFF
            t1 = (h + S1 + ch + _K[r] + w[r]) & 0xFFFFFFFF
            S0 = self._rotr(a, 2) ^ self._rotr(a, 13) ^ self._rotr(a, 22)
            maj = ((a & b) ^ (a & c) ^ (b & c)) & 0xFFFFFFFF
            t2 = (S0 + maj) & 0xFFFFFFFF
            h, g, f, e, d, c, b, a = (g, f, e, (d + t1) & 0xFFFFFFFF,
                                      c, b, a, (t1 + t2) & 0xFFFFFFFF)
            self._states.append((a, b, c, d, e, f, g, h))
        return [(iv + s) & 0xFFFFFFFF
                for iv, s in zip(_IV, self._states[64])]

    @staticmethod
    def _rotr(x, n):
        return ((x >> n) | (x << (32 - n))) & 0xFFFFFFFF

    def _sig0(self, x):
        return (self._rotr(x, 7) ^ self._rotr(x, 18) ^ (x >> 3)) & 0xFFFFFFFF

    def _sig1(self, x):
        return (self._rotr(x, 17) ^ self._rotr(x, 19) ^ (x >> 10)) & 0xFFFFFFFF

    # -- AIR interface ------------------------------------------------------

    def public_inputs(self):
        return [*self.msg_words, *self.digest]

    def constant_columns(self):
        cols = np.zeros((N_CONST, self.n), dtype=np.uint64)
        for r in range(64):
            cols[_CONST["K"], r] = _K[r]
            cols[_CONST["sel_round"], r] = 1
            if r >= 16:
                cols[_CONST["sel_schedule"], r] = 1
                cols[_CONST["sel_wbits"], r] = 1
        for r in range(63):
            cols[_CONST["sel_shift"], r] = 1
        for r in range(65):
            cols[_CONST["sel_state"], r] = 1
        return cols

    def boundaries(self, public):
        msg = public[:16]
        digest = public[16:24]
        final = [(d - iv) % (1 << 32) for d, iv in zip(digest, _IV)]
        out = []

        def bits_of(fam, row, value):
            return [(row, _COLS[f"{fam}{i}"], (value >> i) & 1)
                    for i in range(32)]

        # row 0: initial working state = IV
        a, b, c, d, e, f, g, h = _IV
        out += bits_of("A", 0, a) + bits_of("B", 0, b) + bits_of("C", 0, c)
        out += [(0, _COLS["Dw"], d)]
        out += bits_of("E", 0, e) + bits_of("F", 0, f) + bits_of("G", 0, g)
        out += [(0, _COLS["Hw"], h)]
        # rows 0..15: schedule window slot 0 = message words
        for r in range(16):
            out.append((r, _COLS["W0"], msg[r]))
        # row 64: final working state = digest − IV
        a, b, c, d, e, f, g, h = final
        out += bits_of("A", 64, a) + bits_of("B", 64, b) + bits_of("C", 64, c)
        out += [(64, _COLS["Dw"], d)]
        out += bits_of("E", 64, e) + bits_of("F", 64, f) + bits_of("G", 64, g)
        out += [(64, _COLS["Hw"], h)]
        return out

    def transition(self, alg, local, nxt, public, consts=None):
        one = alg.constant(1)
        two = alg.constant(2)
        k_col = consts[_CONST["K"]]
        sel_round = consts[_CONST["sel_round"]]
        sel_sched = consts[_CONST["sel_schedule"]]
        sel_shift = consts[_CONST["sel_shift"]]
        sel_state = consts[_CONST["sel_state"]]
        sel_wbits = consts[_CONST["sel_wbits"]]

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

        def xor2(x, y):
            # x + y − 2xy
            return alg.sub(alg.add(x, y), alg.mul(two, alg.mul(x, y)))

        def xor3(x, y, z):
            # degree-3 expansion (xor2∘xor2 would be degree 4):
            # x+y+z − 2(xy+yz+zx) + 4xyz
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

        # --- round function (rows 0..63) -----------------------------------
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
        carry_a = word(CA)  # value in [0, 8)
        carry_e = word(CE)
        # next.a + carry_a·2^32 = T1 + T2
        lhs_a = alg.add(word(An), alg.mul(alg.constant(1 << 32), carry_a))
        out.append(gate(sel_round, alg.sub(lhs_a, alg.add(T1, T2))))
        # next.e + carry_e·2^32 = d + T1
        lhs_e = alg.add(word(En), alg.mul(alg.constant(1 << 32), carry_e))
        out.append(gate(sel_round, alg.sub(lhs_e, alg.add(Dw, T1))))
        # rotations of the pipeline: b'=a, c'=b, d'=c, f'=e, g'=f, h'=g
        for i in range(32):
            out.append(gate(sel_round, alg.sub(Bn[i], A[i])))
            out.append(gate(sel_round, alg.sub(Cn[i], B[i])))
            out.append(gate(sel_round, alg.sub(Fn[i], E[i])))
            out.append(gate(sel_round, alg.sub(Gn[i], F[i])))
        out.append(gate(sel_round, alg.sub(Dwn, word(C))))
        out.append(gate(sel_round, alg.sub(Hwn, word(G))))

        # --- schedule window ----------------------------------------------
        # shift: next.W[k] = W[k-1] (rows 0..62)
        for k in range(1, 17):
            out.append(gate(sel_shift, alg.sub(Wn[k], W[k - 1])))
        # bit views: Σ WB2·2^i = W2, Σ WB15·2^i = W15 (rows 16..63)
        out.append(gate(sel_wbits, alg.sub(word(WB2), W[2])))
        out.append(gate(sel_wbits, alg.sub(word(WB15), W[15])))
        # schedule: W0 + cw·2^32 = σ1(W2) + W7 + σ0(W15) + W16 (rows 16..63)
        zero = alg.constant(0)
        sig1 = word([xor3(WB2[(i + 17) % 32], WB2[(i + 19) % 32],
                          WB2[i + 10] if i + 10 < 32 else zero)
                     for i in range(32)])
        sig0 = word([xor3(WB15[(i + 7) % 32], WB15[(i + 18) % 32],
                          WB15[i + 3] if i + 3 < 32 else zero)
                     for i in range(32)])
        carry_w = word(CW)
        lhs_w = alg.add(W[0], alg.mul(alg.constant(1 << 32), carry_w))
        rhs_w = alg.add(alg.add(sig1, W[7]), alg.add(sig0, W[16]))
        out.append(gate(sel_sched, alg.sub(lhs_w, rhs_w)))

        return out

    # -- witness ------------------------------------------------------------

    def build_trace(self) -> np.ndarray:
        tr = np.zeros((WIDTH, self.n), dtype=np.uint64)
        w = self._w
        # schedule window + bit views + schedule carries
        for r in range(self.n):
            for k in range(17):
                if r < 64 + 1 and r - k >= 0 and r - k < 64:
                    tr[_COLS[f"W{k}"], r] = w[r - k]
        for r in range(16, 64):
            for i in range(32):
                tr[_COLS[f"WB2_{i}"], r] = (w[r - 2] >> i) & 1
                tr[_COLS[f"WB15_{i}"], r] = (w[r - 15] >> i) & 1
            total = (self._sig1(w[r - 2]) + w[r - 7]
                     + self._sig0(w[r - 15]) + w[r - 16])
            cw = total >> 32
            for i in range(2):
                tr[_COLS[f"CW{i}"], r] = (cw >> i) & 1
        # states + round carries
        for r in range(65):
            a, b, c, d, e, f, g, h = self._states[r]
            for fam, val in (("A", a), ("B", b), ("C", c),
                             ("E", e), ("F", f), ("G", g)):
                for i in range(32):
                    tr[_COLS[f"{fam}{i}"], r] = (val >> i) & 1
            tr[_COLS["Dw"], r] = d
            tr[_COLS["Hw"], r] = h
        for r in range(64):
            a, b, c, d, e, f, g, h = self._states[r]
            S1 = self._rotr(e, 6) ^ self._rotr(e, 11) ^ self._rotr(e, 25)
            ch = ((e & f) ^ ((~e) & g)) & 0xFFFFFFFF
            t1_full = h + S1 + ch + _K[r] + w[r]
            S0 = self._rotr(a, 2) ^ self._rotr(a, 13) ^ self._rotr(a, 22)
            maj = ((a & b) ^ (a & c) ^ (b & c)) & 0xFFFFFFFF
            t2_full = S0 + maj
            ca = (t1_full + t2_full) >> 32
            ce = (d + t1_full) >> 32
            for i in range(3):
                tr[_COLS[f"CA{i}"], r] = (ca >> i) & 1
                tr[_COLS[f"CE{i}"], r] = (ce >> i) & 1
        return tr


def sha256_compress_oracle(block: bytes) -> bytes:
    """Digest of a single pre-padded block via hashlib-compatible math."""
    air = Sha256CompressAir(block)
    return b"".join(int.to_bytes(x, 4, "big") for x in air.digest)
