"""ed25519 EdDSA ladder AIR: proves [S]B = R + [h]A for a batch of
signatures — the complete in-ZK signature check the reference delegates to
curta's EdDSA STARK (`curta_eddsa_verify_sigs_conditional`,
/root/reference/circuits/builder/justification.rs:237-243; SURVEY.md §2 E3,
§7 hard part 4).

Architecture — a ROUTED MUL MACHINE.  Every row carries 8 independent
GF(2^255−19) multiplication payloads (the FpMul polynomial-identity
technique of `ed25519_air.py`, widened to 3-byte carries), whose operands
are *selector-routed linear combinations* of the row's registers:

    a_j[ℓ] = Σ_type sel_type(row) · Σ_src W[type][j][src] · src[ℓ](row)

with the weight tables W compile-time data and sel_* preprocessed one-hot
row-type columns.  On TPU the whole constraint system evaluates as a few
batched (8, 32, 32, N) limb convolutions — MXU/VPU-shaped, no scalar
control flow.  Row types:

* `dbl`  — extended-Edwards doubling (dbl-2008-hwcd, a=−1): 8 muls.
* `cadd` — unified addition with the base point (add-2008-hwcd-3 with
  precomputed kt2 = 2d·T2, Z2 = 1): 8 muls; the scalar bit (a boolean
  witness column) selects whether the row's result replaces the
  accumulator.
* `dec`  — point decompression: verifies x²·(d·y²+1) ≡ y²−1 for the
  witnessed x against the statement's compressed bytes (sign bit + byte
  canonicality x ≤ q−1 included), and computes kt2 = 2d·x·y.
* `uadd` — unconditional add (the cadd payload program) that stores
  R + [h]A into the saved registers and restarts the accumulator.
* `eq`   — projective equality: X1·SZ ≡ SX·Z1, Y1·SZ ≡ SY·Z1 (mod q),
  via mul payloads with the output pinned to zero.

Per signature the trace runs:  dec(A) → 2·nbits ladder rows computing
[h]A (MSB-first double-and-add, bit recomposition limb-accumulated
against the public scalar) → dec(R) → uadd (acc := R + [h]A, saved) →
2·nbits ladder rows computing [S]B (base pinned to the generator) →
eq row.  4·nbits + 4 rows; nbits = 253 for real scalars.

STATEMENT BINDING: per-signature compressed points and scalar limbs live
in preprocessed columns (`cmp`, `scl`, `pbit`) exactly as in the batched
hash AIRs — the verifier derives the constants commitment from the
statement, so a proof only verifies against the exact signature batch it
was built for.  Scalars S and h are public (h is the SHA-512 challenge
digest reduced mod L — public wiring from the SHA-512 AIR's statement).

Every payload limb/carry byte is range-checked against the shared byte
table through the STARK core's LogUp argument, like `ed25519_air.py`.
"""

from __future__ import annotations

import numpy as np

from vectorx_tpu.curves import ed25519 as ed
from vectorx_tpu.stark.air import Air, Lookup

Q = ed.Q
NA, NK, NC = 32, 33, 63
CB = 3                       # carry bytes (operand combos reach |c| < 2^18)
COFF = 1 << 20               # carry offset: c' = c + COFF ∈ [0, 2^24)
PAYW = NA + NK + CB * NC     # 254 columns per payload
Q_LIMBS = [(Q >> (8 * i)) & 0xFF for i in range(NA)]
QM1_LIMBS = [((Q - 1) >> (8 * i)) & 0xFF for i in range(NA)]

# ---------------------------------------------------------------------------
# column layout
# ---------------------------------------------------------------------------

COL_X1, COL_Y1, COL_Z1, COL_T1 = 0, 32, 64, 96
COL_SX, COL_SY, COL_SZ = 128, 160, 192
COL_X2B, COL_Y2B, COL_KT2B = 224, 256, 288
COL_ACC = 320
COL_XB = 352                 # canonicality witness: q−1−x bytes
COL_XC = 384                 # canonicality carry bits
COL_BR, COL_SGN, COL_XH, COL_PAD0 = 416, 417, 418, 419
COL_P = 420                  # payload j at COL_P + PAYW*j: d | k | e
N_PAY = 8
_PAY_END = COL_P + PAYW * N_PAY      # 2452

# sign-bit binding columns: COL_Y2D holds 2·y2b[31]; byte-checking it
# forces y2b[31] < 128, so y2b[31] = cmp31 − 128·sgn pins sgn to the
# statement's compressed sign bit (advisor round-2 medium finding).
COL_Y2D, COL_PAD1 = _PAY_END, _PAY_END + 1

# byte-checked column pairs (for the LogUp argument)
_CHECK_PAIRS = (
    [(COL_P + 2 * i, COL_P + 2 * i + 1) for i in range(PAYW * N_PAY // 2)]
    + [(COL_X2B + 2 * i, COL_X2B + 2 * i + 1) for i in range(16)]
    + [(COL_Y2B + 2 * i, COL_Y2B + 2 * i + 1) for i in range(16)]
    + [(COL_XB + 2 * i, COL_XB + 2 * i + 1) for i in range(16)]
    + [(COL_XH, COL_PAD0), (COL_Y2D, COL_PAD1)])
COL_M = _PAY_END + 2
WIDTH = COL_M + len(_CHECK_PAIRS)

# preprocessed columns
_CONST_NAMES = (["table", "sel_dbl", "sel_cadd", "sel_uadd", "sel_decA",
                 "sel_decR", "sel_eq", "sel_gbase", "sel_bcopy"]
                + [f"cmp{i}" for i in range(32)]
                + [f"scl{i}" for i in range(32)]
                + [f"pbit{i}" for i in range(32)])
_CONST = {n: i for i, n in enumerate(_CONST_NAMES)}
N_CONST = len(_CONST)

# ---------------------------------------------------------------------------
# operand routing (compile-time data)
# ---------------------------------------------------------------------------

# witness limb-vector sources
S_X1, S_Y1, S_Z1, S_T1 = 0, 1, 2, 3
S_X2B, S_Y2B, S_KT2B = 4, 5, 6
S_SX, S_SY, S_SZ = 7, 8, 9
S_D = 10                      # S_D+j = payload j's output d
# constant limb-vector sources
K_2Q, K_ONE, K_D, K_2D, K_BX, K_BY, K_BKT = range(18, 25)
NSRC = 25

_SRC_COL = {S_X1: COL_X1, S_Y1: COL_Y1, S_Z1: COL_Z1, S_T1: COL_T1,
            S_X2B: COL_X2B, S_Y2B: COL_Y2B, S_KT2B: COL_KT2B,
            S_SX: COL_SX, S_SY: COL_SY, S_SZ: COL_SZ,
            **{S_D + j: COL_P + PAYW * j for j in range(N_PAY)}}


def _limbs(x: int, count: int = NA) -> list[int]:
    return [(x >> (8 * i)) & 0xFF for i in range(count)]


_KVEC = {
    K_2Q: _limbs(2 * Q),
    K_ONE: _limbs(1),
    K_D: _limbs(ed.D),
    K_2D: _limbs((2 * ed.D) % Q),
    K_BX: _limbs(ed.BX),
    K_BY: _limbs(ed.BY),
    K_BKT: _limbs((2 * ed.D * ed.BX * ed.BY) % Q),
}

# per row-type payload programs: 8 payloads of (a_terms, b_terms), each a
# tuple of (source, weight)
_ROUTE = {
    # doubling: A=X1², B=Y1², C=2Z1², M=X1·Y1 (E=2M), D'=−A,
    # G=B−A, F=B−A−C, H=−A−B; X3=E·F, Y3=G·H, Z3=F·G, T3=E·H
    "dbl": [
        (((S_X1, 1),), ((S_X1, 1),)),
        (((S_Y1, 1),), ((S_Y1, 1),)),
        (((S_Z1, 1),), ((S_Z1, 2),)),
        (((S_X1, 1),), ((S_Y1, 1),)),
        (((S_D + 3, 2),),
         ((S_D + 1, 1), (S_D + 0, -1), (S_D + 2, -1), (K_2Q, 2))),
        (((S_D + 1, 1), (S_D + 0, -1), (K_2Q, 1)),
         ((S_D + 0, -1), (S_D + 1, -1), (K_2Q, 2))),
        (((S_D + 1, 1), (S_D + 0, -1), (S_D + 2, -1), (K_2Q, 2)),
         ((S_D + 1, 1), (S_D + 0, -1), (K_2Q, 1))),
        (((S_D + 3, 2),), ((S_D + 0, -1), (S_D + 1, -1), (K_2Q, 2))),
    ],
    # unified add with base (x2b, y2b, kt2b), Z2=1:
    # A=(Y1−X1)(y2−x2), B=(Y1+X1)(y2+x2), C=T1·kt2, D=2Z1,
    # E=B−A, F=D−C, G=D+C, H=B+A; X3=E·F, Y3=G·H, Z3=F·G, T3=E·H
    "cadd": [
        (((S_Y1, 1), (S_X1, -1), (K_2Q, 1)),
         ((S_Y2B, 1), (S_X2B, -1), (K_2Q, 1))),
        (((S_Y1, 1), (S_X1, 1)), ((S_Y2B, 1), (S_X2B, 1))),
        (((S_T1, 1),), ((S_KT2B, 1),)),
        (((S_Z1, 1),), ((K_ONE, 2),)),
        (((S_D + 1, 1), (S_D + 0, -1), (K_2Q, 1)),
         ((S_D + 3, 1), (S_D + 2, -1), (K_2Q, 1))),
        (((S_D + 3, 1), (S_D + 2, 1)), ((S_D + 1, 1), (S_D + 0, 1))),
        (((S_D + 3, 1), (S_D + 2, -1), (K_2Q, 1)),
         ((S_D + 3, 1), (S_D + 2, 1))),
        (((S_D + 1, 1), (S_D + 0, -1), (K_2Q, 1)),
         ((S_D + 1, 1), (S_D + 0, 1))),
    ],
    # decompression: yy=y², dyy=yy·d, xx=x², u=xx·(dyy+1),
    # eqzero(u−(yy−1)), t2=x·y, kt2=t2·2d, pad
    "dec": [
        (((S_Y2B, 1),), ((S_Y2B, 1),)),
        (((S_D + 0, 1),), ((K_D, 1),)),
        (((S_X2B, 1),), ((S_X2B, 1),)),
        (((S_D + 2, 1),), ((S_D + 1, 1), (K_ONE, 1))),
        (((S_D + 3, 1), (S_D + 0, -1), (K_ONE, 1), (K_2Q, 1)),
         ((K_ONE, 1),)),
        (((S_X2B, 1),), ((S_Y2B, 1),)),
        (((S_D + 5, 1),), ((K_2D, 1),)),
        ((), ()),
    ],
    # projective equality vs the saved registers
    "eq": [
        (((S_X1, 1),), ((S_SZ, 1),)),
        (((S_SX, 1),), ((S_Z1, 1),)),
        (((S_D + 0, 1), (S_D + 1, -1), (K_2Q, 1)), ((K_ONE, 1),)),
        (((S_Y1, 1),), ((S_SZ, 1),)),
        (((S_SY, 1),), ((S_Z1, 1),)),
        (((S_D + 3, 1), (S_D + 4, -1), (K_2Q, 1)), ((K_ONE, 1),)),
        ((), ()),
        ((), ()),
    ],
}
# payload program selector per row type (uadd shares cadd's program,
# decA/decR share dec's)
_PROG_SELS = {"dbl": ("sel_dbl",), "cadd": ("sel_cadd", "sel_uadd"),
              "dec": ("sel_decA", "sel_decR"), "eq": ("sel_eq",)}

_IDENTITY = (0, 1, 1, 0)


# ---------------------------------------------------------------------------
# witness helpers
# ---------------------------------------------------------------------------

def _routed_limbs(terms, regs):
    """Integer limb vector of a routed operand at one row.  `regs` maps
    source -> 32-limb int list."""
    out = [0] * NA
    for src, w in terms:
        vec = _KVEC[src] if src in _KVEC else regs[src]
        for u in range(NA):
            out[u] += w * vec[u]
    return out


def _payload_witness(a_limbs, b_limbs):
    """(d_limbs, k_limbs, e_bytes) for one routed multiplication."""
    a_val = sum(v << (8 * u) for u, v in enumerate(a_limbs))
    b_val = sum(v << (8 * u) for u, v in enumerate(b_limbs))
    prod = a_val * b_val
    d = prod % Q
    k = (prod - d) // Q
    assert 0 <= k < (1 << (8 * NK)), "k out of range"
    dl, kl = _limbs(d), _limbs(k, NK)
    p = np.zeros(64, dtype=object)
    for i in range(64):
        s = 0
        for u in range(max(0, i - NA + 1), min(NA - 1, i) + 1):
            s += a_limbs[u] * b_limbs[i - u]
        for u in range(max(0, i - NA + 1), min(NK - 1, i) + 1):
            s -= kl[u] * Q_LIMBS[i - u]
        if i < NA:
            s -= dl[i]
        p[i] = s
    c = [0] * NC
    prev = 0
    for i in range(NC):
        num = prev - int(p[i])
        assert num % 256 == 0, "carry division"
        c[i] = num // 256
        prev = c[i]
    assert c[NC - 1] == int(p[63]), "top carry"
    e = []
    for ci in c:
        cp = ci + COFF
        assert 0 <= cp < (1 << (8 * CB)), "carry out of range"
        e += [(cp >> (8 * t)) & 0xFF for t in range(CB)]
    return dl, kl, e


_PAD_PAYLOAD = None


def _pad_payload():
    global _PAD_PAYLOAD
    if _PAD_PAYLOAD is None:
        _PAD_PAYLOAD = _payload_witness([0] * NA, [0] * NA)
    return _PAD_PAYLOAD


def _as_sigs(sigs):
    out = []
    for s in sigs:
        a_cmp, r_cmp, s_scalar, h_scalar = s
        out.append((bytes(a_cmp), bytes(r_cmp), int(s_scalar),
                    int(h_scalar)))
    return out


class Ed25519LadderAir(Air):
    """Batch EdDSA-equation proofs: one (A_cmp, R_cmp, S, h) tuple per
    signature, statement-bound via preprocessed columns."""

    def comp_cache_key(self):
        # device transition reads statement data only through
        # consts/boundary values (traced) - graph shareable by shape
        from vectorx_tpu.stark.air import scalar_attrs_cache_key
        return scalar_attrs_cache_key(self)


    def __init__(self, sigs, nbits: int = 253, log_n: int | None = None):
        self.sigs = _as_sigs(sigs)
        self.nbits = nbits
        self._shape(log_n)
        super().__init__(width=WIDTH, log_n=self._log_n,
                         constraint_degree=4)
        self._witness = True

    def _shape(self, log_n):
        assert self.sigs
        for (_a, _r, s, h) in self.sigs:
            assert 0 <= s < (1 << self.nbits)
            assert 0 <= h < (1 << self.nbits)
        self.rows_per_sig = 4 * self.nbits + 4
        self.total_rows = self.rows_per_sig * len(self.sigs)
        # byte table needs n ≥ 257; +1 keeps the last sig's eq row off the
        # masked final transition row
        need = max(9, (self.total_rows + 1).bit_length())
        self._log_n = log_n if log_n is not None else need
        assert (1 << self._log_n) >= self.total_rows + 1

    @classmethod
    def statement(cls, sigs, nbits: int = 253,
                  log_n: int | None = None) -> "Ed25519LadderAir":
        """Verifier-side construction — no witness computation."""
        self = object.__new__(cls)
        self.sigs = _as_sigs(sigs)
        self.nbits = nbits
        self._shape(log_n)
        Air.__init__(self, width=WIDTH, log_n=self._log_n,
                     constraint_degree=4)
        self._witness = False
        return self

    # -- row schedule -------------------------------------------------------

    def _row_types(self):
        """Per signature-block offset: (type, extra) where type in
        {decA, dbl2, cadd2, decR, uadd, dbl1, cadd1, eq}."""
        nb = self.nbits
        sched = [("decA", None)]
        for j in range(nb):
            sched.append(("dbl", None))
            sched.append(("cadd", nb - 1 - j))      # bit index
        sched.append(("decR", None))
        sched.append(("uadd", None))
        for j in range(nb):
            sched.append(("dbl1", None))
            sched.append(("cadd1", nb - 1 - j))
        sched.append(("eq", None))
        assert len(sched) == self.rows_per_sig
        return sched

    # -- framework hooks ----------------------------------------------------

    def public_inputs(self):
        return [len(self.sigs), self.nbits]

    def lookups(self):
        return [Lookup(inputs=pair, table=0, multiplicity=COL_M + i)
                for i, pair in enumerate(_CHECK_PAIRS)]

    def constant_columns(self):
        cols = np.zeros((N_CONST, self.n), dtype=np.uint64)
        cols[_CONST["table"]] = np.minimum(
            np.arange(self.n, dtype=np.uint64), np.uint64(255))
        sched = self._row_types()
        for si, (a_cmp, r_cmp, s_scalar, h_scalar) in enumerate(self.sigs):
            base = si * self.rows_per_sig
            s_limbs = _limbs(s_scalar)
            h_limbs = _limbs(h_scalar)
            for off, (ty, bit_idx) in enumerate(sched):
                r = base + off
                if ty == "decA":
                    cols[_CONST["sel_decA"], r] = 1
                    cols[_CONST["sel_bcopy"], r] = 1
                    for i in range(32):
                        cols[_CONST[f"cmp{i}"], r] = a_cmp[i]
                elif ty == "dbl":
                    cols[_CONST["sel_dbl"], r] = 1
                    cols[_CONST["sel_bcopy"], r] = 1
                elif ty == "cadd":
                    cols[_CONST["sel_cadd"], r] = 1
                    # base copy continues except into the decR row
                    if bit_idx != 0:
                        cols[_CONST["sel_bcopy"], r] = 1
                    cols[_CONST[f"pbit{bit_idx // 8}"], r] = \
                        1 << (bit_idx % 8)
                elif ty == "decR":
                    cols[_CONST["sel_decR"], r] = 1
                    cols[_CONST["sel_bcopy"], r] = 1
                    for i in range(32):
                        cols[_CONST[f"cmp{i}"], r] = r_cmp[i]
                        cols[_CONST[f"scl{i}"], r] = h_limbs[i]
                elif ty == "uadd":
                    cols[_CONST["sel_uadd"], r] = 1
                elif ty == "dbl1":
                    cols[_CONST["sel_dbl"], r] = 1
                    cols[_CONST["sel_gbase"], r] = 1
                elif ty == "cadd1":
                    cols[_CONST["sel_cadd"], r] = 1
                    cols[_CONST["sel_gbase"], r] = 1
                    cols[_CONST[f"pbit{bit_idx // 8}"], r] = \
                        1 << (bit_idx % 8)
                elif ty == "eq":
                    cols[_CONST["sel_eq"], r] = 1
                    for i in range(32):
                        cols[_CONST[f"scl{i}"], r] = s_limbs[i]
        return cols

    def boundaries(self, public):
        return []

    # -- witness ------------------------------------------------------------

    def build_trace(self) -> np.ndarray:
        assert self._witness, "statement-only AIR has no witness"
        tr = np.zeros((WIDTH, self.n), dtype=np.uint64)
        # padding payloads on every row first (overwritten below)
        _pd, _pk, pe = _pad_payload()
        pe_col = np.array(pe, dtype=np.uint64)[:, None]
        for j in range(N_PAY):
            pc = COL_P + PAYW * j
            tr[pc + NA + NK:pc + PAYW, : self.n - 1] = pe_col
        for si in range(len(self.sigs)):
            self._build_sig(tr, si)
        # multiplicities over rows 0..n-2 for every checked pair
        for i, (c0, c1) in enumerate(_CHECK_PAIRS):
            pair = tr[[c0, c1], : self.n - 1]
            counts = np.bincount(pair.reshape(-1).astype(np.int64),
                                 minlength=256)
            tr[COL_M + i, :256] = counts[:256]
        return tr

    def _set_regs(self, tr, r, regs):
        for src, col in _SRC_COL.items():
            if src >= S_D:
                continue
            if src in regs:
                tr[col:col + NA, r] = regs[src]

    def _emit_payloads(self, tr, r, prog, regs):
        """Compute and store the 8 payloads; returns list of d ints."""
        douts = []
        for j in range(N_PAY):
            a_t, b_t = prog[j]
            if not a_t and not b_t:
                d_int = 0
                dl, kl, e = _pad_payload()
            else:
                al = _routed_limbs(a_t, regs)
                bl = _routed_limbs(b_t, regs)
                dl, kl, e = _payload_witness(al, bl)
                d_int = sum(v << (8 * u) for u, v in enumerate(dl))
            pc = COL_P + PAYW * j
            tr[pc:pc + NA, r] = dl
            tr[pc + NA:pc + NA + NK, r] = kl
            tr[pc + NA + NK:pc + PAYW, r] = e
            regs[S_D + j] = dl
            douts.append(d_int)
        return douts

    def _build_sig(self, tr, si):
        a_cmp, r_cmp, s_scalar, h_scalar = self.sigs[si]
        A = ed.point_decompress(a_cmp)
        R = ed.point_decompress(r_cmp)
        assert A is not None and R is not None, "invalid compressed point"
        base = si * self.rows_per_sig
        sched = self._row_types()
        state = list(_IDENTITY)
        saved = (0, 0, 0)
        acc_limbs = [0] * NA
        cur_base = None          # (x2, y2, kt2)

        def dec_row(r, point, cmp_bytes):
            x, y = point[0], point[1]
            kt2 = (2 * ed.D * x * y) % Q
            regs = {S_X1: _limbs(state[0]), S_Y1: _limbs(state[1]),
                    S_Z1: _limbs(state[2]), S_T1: _limbs(state[3]),
                    S_X2B: _limbs(x), S_Y2B: _limbs(y),
                    S_KT2B: _limbs(kt2),
                    S_SX: _limbs(saved[0]), S_SY: _limbs(saved[1]),
                    S_SZ: _limbs(saved[2])}
            self._set_regs(tr, r, regs)
            tr[COL_ACC:COL_ACC + NA, r] = acc_limbs
            self._emit_payloads(tr, r, _ROUTE["dec"], regs)
            sgn = cmp_bytes[31] >> 7
            tr[COL_SGN, r] = sgn
            tr[COL_XH, r] = (_limbs(x)[0] - sgn) // 2
            tr[COL_Y2D, r] = 2 * _limbs(y)[31]
            # canonicality: x + b = q−1 with byte carries
            b_val = (Q - 1) - x
            assert b_val >= 0
            bl = _limbs(b_val)
            xl = _limbs(x)
            carry = 0
            for u in range(NA):
                tot = xl[u] + bl[u] + carry
                nc = (tot - QM1_LIMBS[u]) // 256
                assert tot == QM1_LIMBS[u] + 256 * nc and nc in (0, 1)
                tr[COL_XB + u, r] = bl[u]
                tr[COL_XC + u, r] = nc
                carry = nc
            assert carry == 0
            return (x, y, kt2)

        def ladder_row(r, ty, bit, bpoint):
            x2, y2, kt2 = bpoint
            regs = {S_X1: _limbs(state[0]), S_Y1: _limbs(state[1]),
                    S_Z1: _limbs(state[2]), S_T1: _limbs(state[3]),
                    S_X2B: _limbs(x2), S_Y2B: _limbs(y2),
                    S_KT2B: _limbs(kt2),
                    S_SX: _limbs(saved[0]), S_SY: _limbs(saved[1]),
                    S_SZ: _limbs(saved[2])}
            self._set_regs(tr, r, regs)
            tr[COL_ACC:COL_ACC + NA, r] = acc_limbs
            if ty == "dbl":
                d = self._emit_payloads(tr, r, _ROUTE["dbl"], regs)
                return (d[4], d[5], d[6], d[7])
            tr[COL_BR, r] = bit
            d = self._emit_payloads(tr, r, _ROUTE["cadd"], regs)
            return (d[4], d[5], d[6], d[7])

        for off, (ty, bit_idx) in enumerate(sched):
            r = base + off
            if ty == "decA":
                # dec rows carry zero state/saved/acc (the previous eq row
                # and the decA transition force this shape)
                state = [0, 0, 0, 0]
                saved = (0, 0, 0)
                acc_limbs = [0] * NA
                cur_base = dec_row(r, A, a_cmp)
                state = list(_IDENTITY)   # forced by the decA transition
            elif ty == "decR":
                cur_base = dec_row(r, R, r_cmp)
                # state (acc2) passes through unchanged
            elif ty in ("dbl", "dbl1"):
                bp = cur_base if ty == "dbl" else \
                    (ed.BX, ed.BY, (2 * ed.D * ed.BX * ed.BY) % Q)
                new = ladder_row(r, "dbl", None, bp)
                state = list(new)
            elif ty in ("cadd", "cadd1"):
                scalar = h_scalar if ty == "cadd" else s_scalar
                bit = (scalar >> bit_idx) & 1
                bp = cur_base if ty == "cadd" else \
                    (ed.BX, ed.BY, (2 * ed.D * ed.BX * ed.BY) % Q)
                new = ladder_row(r, "cadd", bit, bp)
                if bit:
                    state = list(new)
                acc_limbs = list(acc_limbs)
                acc_limbs[bit_idx // 8] += bit << (bit_idx % 8)
            elif ty == "uadd":
                new = ladder_row(r, "cadd", 1, cur_base)
                saved = (new[0], new[1], new[2])
                state = list(_IDENTITY)
                acc_limbs = [0] * NA
            elif ty == "eq":
                # fail fast on a false statement: the eq payloads could
                # not satisfy their pinned-zero outputs anyway
                assert (state[0] * saved[2] - saved[0] * state[2]) % Q == 0 \
                    and (state[1] * saved[2] - saved[1] * state[2]) % Q == 0, \
                    "[S]B != R + [h]A — refusing to build a false witness"
                regs = {S_X1: _limbs(state[0]), S_Y1: _limbs(state[1]),
                        S_Z1: _limbs(state[2]), S_T1: _limbs(state[3]),
                        S_X2B: [0] * NA, S_Y2B: [0] * NA,
                        S_KT2B: [0] * NA,
                        S_SX: _limbs(saved[0]), S_SY: _limbs(saved[1]),
                        S_SZ: _limbs(saved[2])}
                self._set_regs(tr, r, regs)
                tr[COL_ACC:COL_ACC + NA, r] = acc_limbs
                self._emit_payloads(tr, r, _ROUTE["eq"], regs)

    # -- constraints --------------------------------------------------------

    def transition(self, alg, local, nxt, public, consts=None):
        from vectorx_tpu.stark.air import DeviceAlgebra

        if alg is DeviceAlgebra:
            return self._transition_device(local, nxt, consts)
        return self._transition_generic(alg, local, nxt, consts)

    def _transition_generic(self, alg, local, nxt, consts):
        one = alg.constant(1)
        sels = {nm: consts[_CONST[nm]] for nm in
                ("sel_dbl", "sel_cadd", "sel_uadd", "sel_decA",
                 "sel_decR", "sel_eq", "sel_gbase", "sel_bcopy")}
        out = []

        # routed operand limb expressions: a[j][u] summed over programs
        def operand(side):
            ops = [[None] * NA for _ in range(N_PAY)]
            for prog_name, sel_names in _PROG_SELS.items():
                sel = sels[sel_names[0]]
                for extra in sel_names[1:]:
                    sel = alg.add(sel, sels[extra])
                prog = _ROUTE[prog_name]
                for j in range(N_PAY):
                    terms = prog[j][side]
                    if not terms:
                        continue
                    for u in range(NA):
                        acc = None
                        for src, w in terms:
                            if src in _KVEC:
                                v = _KVEC[src][u] * w
                                if v == 0:
                                    continue
                                t = alg.mul(sel, alg.constant(v))
                            else:
                                col = _SRC_COL[src] + u
                                t = alg.mul(alg.constant(w),
                                            local[col]) if w != 1 \
                                    else local[col]
                                t = alg.mul(sel, t)
                            acc = t if acc is None else alg.add(acc, t)
                        if acc is None:
                            continue
                        ops[j][u] = acc if ops[j][u] is None \
                            else alg.add(ops[j][u], acc)
            zero = alg.constant(0)
            return [[x if x is not None else zero for x in row]
                    for row in ops]

        a_ops = operand(0)
        b_ops = operand(1)

        # 1. mul identities, payload-major, coefficient-minor
        for j in range(N_PAY):
            pc = COL_P + PAYW * j
            d = [local[pc + u] for u in range(NA)]
            k = [local[pc + NA + u] for u in range(NK)]
            cp = []
            for i in range(NC):
                ec = pc + NA + NK + CB * i
                c = local[ec]
                c = alg.add(c, alg.mul(alg.constant(256), local[ec + 1]))
                c = alg.add(c, alg.mul(alg.constant(65536), local[ec + 2]))
                cp.append(c)
            for i in range(64):
                acc = alg.constant(0)
                for u in range(max(0, i - NA + 1), min(NA - 1, i) + 1):
                    acc = alg.add(acc, alg.mul(a_ops[j][u],
                                               b_ops[j][i - u]))
                for u in range(max(0, i - NA + 1), min(NK - 1, i) + 1):
                    if Q_LIMBS[i - u]:
                        acc = alg.sub(acc, alg.mul(
                            k[u], alg.constant(Q_LIMBS[i - u])))
                if i < NA:
                    acc = alg.sub(acc, d[i])
                const = 0
                if i > 0:
                    acc = alg.sub(acc, cp[i - 1])
                    const += COFF
                if i < NC:
                    acc = alg.add(acc, alg.mul(alg.constant(256), cp[i]))
                    const -= 256 * COFF
                out.append(alg.add(acc, alg.constant(const)))

        br = local[COL_BR]
        d_of = [COL_P + PAYW * j for j in range(N_PAY)]

        # 2. state transition (X1, Y1, Z1, T1)
        for t_i, (col, idv) in enumerate(
                zip((COL_X1, COL_Y1, COL_Z1, COL_T1), _IDENTITY)):
            dj = d_of[4 + t_i]
            for u in range(NA):
                idl = (idv >> (8 * u)) & 0xFF
                sel_out = alg.mul(sels["sel_dbl"], local[dj + u])
                # cadd: X1 + br·(d − X1)
                cd = alg.add(local[col + u],
                             alg.mul(br, alg.sub(local[dj + u],
                                                 local[col + u])))
                sel_out = alg.add(sel_out, alg.mul(sels["sel_cadd"], cd))
                if idl:
                    idc = alg.constant(idl)
                    sel_out = alg.add(sel_out,
                                      alg.mul(alg.add(sels["sel_uadd"],
                                                      sels["sel_decA"]),
                                              idc))
                sel_out = alg.add(sel_out, alg.mul(sels["sel_decR"],
                                                   local[col + u]))
                out.append(alg.sub(nxt[col + u], sel_out))

        # 3. saved registers (SX, SY, SZ)
        copy_sel = alg.add(alg.add(sels["sel_decA"], sels["sel_dbl"]),
                           alg.add(sels["sel_cadd"], sels["sel_decR"]))
        for t_i, col in enumerate((COL_SX, COL_SY, COL_SZ)):
            dj = d_of[4 + t_i]
            for u in range(NA):
                v = alg.add(alg.mul(copy_sel, local[col + u]),
                            alg.mul(sels["sel_uadd"], local[dj + u]))
                out.append(alg.sub(nxt[col + u], v))

        # 4. base registers: copy + generator binding
        for col in (COL_X2B, COL_Y2B, COL_KT2B):
            for u in range(NA):
                out.append(alg.mul(sels["sel_bcopy"],
                                   alg.sub(nxt[col + u], local[col + u])))
        for col, kv in ((COL_X2B, K_BX), (COL_Y2B, K_BY),
                        (COL_KT2B, K_BKT)):
            for u in range(NA):
                out.append(alg.mul(sels["sel_gbase"],
                                   alg.sub(local[col + u],
                                           alg.constant(_KVEC[kv][u]))))

        # 5. scalar-bit accumulator
        for u in range(NA):
            v = alg.mul(sels["sel_dbl"], local[COL_ACC + u])
            cd = alg.add(local[COL_ACC + u],
                         alg.mul(br, consts[_CONST[f"pbit{u}"]]))
            v = alg.add(v, alg.mul(sels["sel_cadd"], cd))
            v = alg.add(v, alg.mul(sels["sel_decR"], local[COL_ACC + u]))
            out.append(alg.sub(nxt[COL_ACC + u], v))

        # 6. scalar end checks (decR: h, eq: S)
        end_sel = alg.add(sels["sel_decR"], sels["sel_eq"])
        for u in range(NA):
            out.append(alg.mul(end_sel,
                               alg.sub(local[COL_ACC + u],
                                       consts[_CONST[f"scl{u}"]])))

        # 7. dec-row extras
        sel_dec = alg.add(sels["sel_decA"], sels["sel_decR"])
        for u in range(NA):                       # forced-zero eq payload
            out.append(alg.mul(sel_dec, local[d_of[4] + u]))
        for u in range(NA):                       # kt2 binding
            out.append(alg.mul(sel_dec, alg.sub(local[COL_KT2B + u],
                                                local[d_of[6] + u])))
        sgn = local[COL_SGN]
        for u in range(NA):                       # y2 from statement bytes
            e = alg.sub(local[COL_Y2B + u], consts[_CONST[f"cmp{u}"]])
            if u == 31:
                e = alg.add(e, alg.mul(alg.constant(128), sgn))
            out.append(alg.mul(sel_dec, e))
        out.append(alg.mul(sel_dec, alg.sub(
            local[COL_X2B],
            alg.add(alg.mul(alg.constant(2), local[COL_XH]), sgn))))
        out.append(alg.mul(sel_dec, alg.mul(sgn, alg.sub(sgn, one))))
        # byte-checked COL_Y2D = 2·y2b[31] forces y2b[31] < 128, pinning
        # sgn to the statement sign bit (cmp31 >> 7)
        out.append(alg.mul(sel_dec, alg.sub(
            local[COL_Y2D],
            alg.mul(alg.constant(2), local[COL_Y2B + 31]))))
        # canonicality: x + b + carry_in = (q−1) limbs + 256·carry_out
        for u in range(NA):
            lhs = alg.add(local[COL_X2B + u], local[COL_XB + u])
            if u > 0:
                lhs = alg.add(lhs, local[COL_XC + u - 1])
            rhs = alg.add(alg.constant(QM1_LIMBS[u]),
                          alg.mul(alg.constant(256), local[COL_XC + u]))
            out.append(alg.mul(sel_dec, alg.sub(lhs, rhs)))
        out.append(alg.mul(sel_dec, local[COL_XC + NA - 1]))  # no overflow
        for u in range(NA):                       # carry booleanity
            c = local[COL_XC + u]
            out.append(alg.mul(sel_dec, alg.mul(c, alg.sub(c, one))))

        # 8. cadd scalar-bit booleanity
        out.append(alg.mul(sels["sel_cadd"], alg.mul(br, alg.sub(br, one))))

        # 9. eq-row forced zeros
        for u in range(NA):
            out.append(alg.mul(sels["sel_eq"], local[d_of[2] + u]))
        for u in range(NA):
            out.append(alg.mul(sels["sel_eq"], local[d_of[5] + u]))

        return out

    def _transition_device(self, local, nxt, consts):
        """Vectorized device path: identical constraints and emission
        order, evaluated as stacked (j, limb, N) batches — the routed-mul
        machine maps to a handful of big limb convolutions."""
        import jax.numpy as jnp

        from vectorx_tpu.field import goldilocks as gl

        sels = {nm: consts[_CONST[nm]] for nm in
                ("sel_dbl", "sel_cadd", "sel_uadd", "sel_decA",
                 "sel_decR", "sel_eq", "sel_gbase", "sel_bcopy")}

        def stack(cols, base, count):
            return (jnp.stack([cols[base + u][0] for u in range(count)]),
                    jnp.stack([cols[base + u][1] for u in range(count)]))

        def add(a, b):
            return gl.add(a[0], a[1], b[0], b[1])

        def sub(a, b):
            return gl.sub(a[0], a[1], b[0], b[1])

        def mul(a, b):
            return gl.mul(a[0], a[1], b[0], b[1])

        def cmul(kc, a):
            kk = int(kc) % gl.P
            return gl.mul(a[0], a[1], np.uint32(kk & 0xFFFFFFFF),
                          np.uint32(kk >> 32))

        N = local[0][0].shape[0]
        out = []

        # source stacks (10 witness sources)
        srcs = {s: stack(local, _SRC_COL[s], NA)
                for s in list(range(10)) + [S_D + j for j in range(N_PAY)]}

        # routed operands: (8, 32, N) accumulated over programs
        def operand(side):
            acc = (jnp.zeros((N_PAY, NA, N), dtype=jnp.uint32),
                   jnp.zeros((N_PAY, NA, N), dtype=jnp.uint32))
            for prog_name, sel_names in _PROG_SELS.items():
                sel = sels[sel_names[0]]
                for extra in sel_names[1:]:
                    sel = add(sel, sels[extra])
                prog = _ROUTE[prog_name]
                rows = []     # per payload: (32, N) pair or None
                cmat = np.zeros((N_PAY, NA), dtype=np.uint64)
                for j in range(N_PAY):
                    row = None
                    for src, w in prog[j][side]:
                        if src in _KVEC:
                            for u in range(NA):
                                cmat[j, u] = (int(cmat[j, u])
                                              + w * _KVEC[src][u]) % gl.P
                        else:
                            t = cmul(w, srcs[src]) if w != 1 else srcs[src]
                            row = t if row is None else add(row, t)
                    if row is None:
                        row = (jnp.zeros((NA, N), jnp.uint32),
                               jnp.zeros((NA, N), jnp.uint32))
                    rows.append(row)
                cont = (jnp.stack([r[0] for r in rows]),
                        jnp.stack([r[1] for r in rows]))
                if np.any(cmat):
                    kl, kh = gl.from_u64(cmat)
                    cont = add(cont, (jnp.broadcast_to(
                        jnp.asarray(kl)[:, :, None], cont[0].shape),
                        jnp.broadcast_to(
                            jnp.asarray(kh)[:, :, None], cont[1].shape)))
                gated = gl.mul(cont[0], cont[1],
                               sel[0][None, None, :], sel[1][None, None, :])
                acc = add(acc, gated)
            return acc

        a_ops = operand(0)
        b_ops = operand(1)

        # payload stacks
        dstk = (jnp.stack([stack(local, COL_P + PAYW * j, NA)[0]
                           for j in range(N_PAY)]),
                jnp.stack([stack(local, COL_P + PAYW * j, NA)[1]
                           for j in range(N_PAY)]))
        kstk = (jnp.stack([stack(local, COL_P + PAYW * j + NA, NK)[0]
                           for j in range(N_PAY)]),
                jnp.stack([stack(local, COL_P + PAYW * j + NA, NK)[1]
                           for j in range(N_PAY)]))
        estk = (jnp.stack([stack(local, COL_P + PAYW * j + NA + NK,
                                 CB * NC)[0] for j in range(N_PAY)]),
                jnp.stack([stack(local, COL_P + PAYW * j + NA + NK,
                                 CB * NC)[1] for j in range(N_PAY)]))
        # carries c' = e0 + 256 e1 + 65536 e2 : (8, 63, N)
        cp = add(add((estk[0][:, 0::3], estk[1][:, 0::3]),
                     cmul(256, (estk[0][:, 1::3], estk[1][:, 1::3]))),
                 cmul(65536, (estk[0][:, 2::3], estk[1][:, 2::3])))

        # convolution coefficients per payload via masked diag gather
        U = np.zeros((64, NA), dtype=np.int32)
        V = np.zeros((64, NA), dtype=np.int32)
        M = np.zeros((64, NA), dtype=bool)
        for i in range(64):
            for t, u in enumerate(range(max(0, i - NA + 1),
                                        min(NA - 1, i) + 1)):
                U[i, t], V[i, t], M[i, t] = u, i - u, True
        UK = np.zeros((64, NK), dtype=np.int32)
        VK = np.zeros((64, NK), dtype=np.int32)
        MK = np.zeros((64, NK), dtype=bool)
        for i in range(64):
            for t, u in enumerate(range(max(0, i - NA + 1),
                                        min(NK - 1, i) + 1)):
                UK[i, t], VK[i, t], MK[i, t] = u, i - u, True
        qv = np.array(Q_LIMBS, dtype=np.uint64)
        qvl = jnp.asarray((qv & 0xFFFFFFFF).astype(np.uint32))

        def tree_axis(pl, ph, axis):
            while pl.shape[axis] > 1:
                half = pl.shape[axis] // 2
                sl_a = [slice(None)] * pl.ndim
                sl_b = [slice(None)] * pl.ndim
                sl_a[axis] = slice(0, half)
                sl_b[axis] = slice(half, 2 * half)
                sl, sh = gl.add(pl[tuple(sl_a)], ph[tuple(sl_a)],
                                pl[tuple(sl_b)], ph[tuple(sl_b)])
                if pl.shape[axis] % 2:
                    sl_c = [slice(None)] * pl.ndim
                    sl_c[axis] = slice(-1, None)
                    sl = jnp.concatenate([sl, pl[tuple(sl_c)]], axis=axis)
                    sh = jnp.concatenate([sh, ph[tuple(sl_c)]], axis=axis)
                pl, ph = sl, sh
            idx = [slice(None)] * pl.ndim
            idx[axis] = 0
            return pl[tuple(idx)], ph[tuple(idx)]

        p_parts = []
        for j in range(N_PAY):
            ab = gl.mul(a_ops[0][j][:, None], a_ops[1][j][:, None],
                        b_ops[0][j][None, :], b_ops[1][j][None, :])
            mask = jnp.asarray(M)[:, :, None]
            conv = tree_axis(jnp.where(mask, ab[0][U, V], 0),
                             jnp.where(mask, ab[1][U, V], 0), 1)
            kq = gl.mul(kstk[0][j][:, None], kstk[1][j][:, None],
                        qvl[None, :, None],
                        jnp.zeros((1, NA, 1), jnp.uint32))
            maskk = jnp.asarray(MK)[:, :, None]
            convk = tree_axis(jnp.where(maskk, kq[0][UK, VK], 0),
                              jnp.where(maskk, kq[1][UK, VK], 0), 1)
            pl_, ph_ = gl.sub(conv[0], conv[1], convk[0], convk[1])
            zero32 = jnp.zeros_like(dstk[0][j])
            pl_, ph_ = gl.sub(pl_, ph_,
                              jnp.concatenate([dstk[0][j], zero32]),
                              jnp.concatenate([dstk[1][j], zero32]))
            zrow = jnp.zeros_like(cp[0][j][:1])
            pl_, ph_ = gl.sub(pl_, ph_,
                              jnp.concatenate([zrow, cp[0][j]]),
                              jnp.concatenate([zrow, cp[1][j]]))
            c256 = cmul(256, (cp[0][j], cp[1][j]))
            pl_, ph_ = gl.add(pl_, ph_,
                              jnp.concatenate([c256[0], zrow]),
                              jnp.concatenate([c256[1], zrow]))
            consts_i = np.array(
                [((COFF if i > 0 else 0)
                  - (256 * COFF if i < NC else 0)) % gl.P
                 for i in range(64)], dtype=np.uint64)
            cl_, ch_ = gl.from_u64(consts_i)
            pl_, ph_ = gl.add(pl_, ph_, jnp.asarray(cl_)[:, None],
                              jnp.asarray(ch_)[:, None])
            p_parts.append((pl_, ph_))
        for pl_, ph_ in p_parts:
            for i in range(64):
                out.append((pl_[i], ph_[i]))

        br = local[COL_BR]
        one = (jnp.uint32(1), jnp.uint32(0))

        def emit_rows(rows):
            out.extend((rows[0][u], rows[1][u])
                       for u in range(rows[0].shape[0]))

        # 2. state transition
        st = {c: stack(local, c, NA)
              for c in (COL_X1, COL_Y1, COL_Z1, COL_T1)}
        stn = {c: stack(nxt, c, NA)
               for c in (COL_X1, COL_Y1, COL_Z1, COL_T1)}
        for t_i, (col, idv) in enumerate(
                zip((COL_X1, COL_Y1, COL_Z1, COL_T1), _IDENTITY)):
            dj = (dstk[0][4 + t_i], dstk[1][4 + t_i])
            cur = st[col]
            sel_out = gl.mul(dj[0], dj[1], sels["sel_dbl"][0][None],
                             sels["sel_dbl"][1][None])
            cd = add(cur, gl.mul(*sub(dj, cur), br[0][None], br[1][None]))
            sel_out = add(sel_out, gl.mul(cd[0], cd[1],
                                          sels["sel_cadd"][0][None],
                                          sels["sel_cadd"][1][None]))
            if idv:
                idvec = np.array(_limbs(idv), dtype=np.uint64)
                il, ih = gl.from_u64(idvec)
                su = add(sels["sel_uadd"], sels["sel_decA"])
                idt = gl.mul(jnp.asarray(il)[:, None],
                             jnp.asarray(ih)[:, None],
                             su[0][None], su[1][None])
                sel_out = add(sel_out, idt)
            sel_out = add(sel_out, gl.mul(cur[0], cur[1],
                                          sels["sel_decR"][0][None],
                                          sels["sel_decR"][1][None]))
            emit_rows(sub(stn[col], sel_out))

        # 3. saved registers
        copy_sel = add(add(sels["sel_decA"], sels["sel_dbl"]),
                       add(sels["sel_cadd"], sels["sel_decR"]))
        for t_i, col in enumerate((COL_SX, COL_SY, COL_SZ)):
            dj = (dstk[0][4 + t_i], dstk[1][4 + t_i])
            cur = stack(local, col, NA)
            nxtv = stack(nxt, col, NA)
            v = add(gl.mul(cur[0], cur[1], copy_sel[0][None],
                           copy_sel[1][None]),
                    gl.mul(dj[0], dj[1], sels["sel_uadd"][0][None],
                           sels["sel_uadd"][1][None]))
            emit_rows(sub(nxtv, v))

        # 4. base registers
        for col in (COL_X2B, COL_Y2B, COL_KT2B):
            cur = stack(local, col, NA)
            nxtv = stack(nxt, col, NA)
            e = sub(nxtv, cur)
            emit_rows(gl.mul(e[0], e[1], sels["sel_bcopy"][0][None],
                             sels["sel_bcopy"][1][None]))
        for col, kv in ((COL_X2B, K_BX), (COL_Y2B, K_BY),
                        (COL_KT2B, K_BKT)):
            cur = stack(local, col, NA)
            kvec = np.array(_KVEC[kv], dtype=np.uint64)
            kl, kh = gl.from_u64(kvec)
            e = gl.sub(cur[0], cur[1], jnp.asarray(kl)[:, None],
                       jnp.asarray(kh)[:, None])
            emit_rows(gl.mul(e[0], e[1], sels["sel_gbase"][0][None],
                             sels["sel_gbase"][1][None]))

        # 5. scalar-bit accumulator
        accv = stack(local, COL_ACC, NA)
        accn = stack(nxt, COL_ACC, NA)
        pbit = (jnp.stack([consts[_CONST[f"pbit{u}"]][0]
                           for u in range(NA)]),
                jnp.stack([consts[_CONST[f"pbit{u}"]][1]
                           for u in range(NA)]))
        v = gl.mul(accv[0], accv[1], sels["sel_dbl"][0][None],
                   sels["sel_dbl"][1][None])
        cd = add(accv, gl.mul(pbit[0], pbit[1], br[0][None], br[1][None]))
        v = add(v, gl.mul(cd[0], cd[1], sels["sel_cadd"][0][None],
                          sels["sel_cadd"][1][None]))
        v = add(v, gl.mul(accv[0], accv[1], sels["sel_decR"][0][None],
                          sels["sel_decR"][1][None]))
        emit_rows(sub(accn, v))

        # 6. scalar end checks
        end_sel = add(sels["sel_decR"], sels["sel_eq"])
        scl = (jnp.stack([consts[_CONST[f"scl{u}"]][0]
                          for u in range(NA)]),
               jnp.stack([consts[_CONST[f"scl{u}"]][1]
                          for u in range(NA)]))
        e = sub(accv, scl)
        emit_rows(gl.mul(e[0], e[1], end_sel[0][None], end_sel[1][None]))

        # 7. dec-row extras
        sel_dec = add(sels["sel_decA"], sels["sel_decR"])
        d4 = (dstk[0][4], dstk[1][4])
        emit_rows(gl.mul(d4[0], d4[1], sel_dec[0][None], sel_dec[1][None]))
        kt2b = stack(local, COL_KT2B, NA)
        d6 = (dstk[0][6], dstk[1][6])
        e = sub(kt2b, d6)
        emit_rows(gl.mul(e[0], e[1], sel_dec[0][None], sel_dec[1][None]))
        sgn = local[COL_SGN]
        y2b = stack(local, COL_Y2B, NA)
        cmpv = (jnp.stack([consts[_CONST[f"cmp{u}"]][0]
                           for u in range(NA)]),
                jnp.stack([consts[_CONST[f"cmp{u}"]][1]
                           for u in range(NA)]))
        e = sub(y2b, cmpv)
        s128 = cmul(128, sgn)
        corr = gl.add(e[0][31], e[1][31], s128[0], s128[1])
        e = (e[0].at[31].set(corr[0]), e[1].at[31].set(corr[1]))
        emit_rows(gl.mul(e[0], e[1], sel_dec[0][None], sel_dec[1][None]))
        par = sub((local[COL_X2B][0], local[COL_X2B][1]),
                  add(cmul(2, local[COL_XH]), sgn))
        out.append(mul(sel_dec, par))
        sm1 = sub(sgn, one)
        out.append(mul(sel_dec, mul(sgn, sm1)))
        y2d = sub(local[COL_Y2D], cmul(2, (y2b[0][31], y2b[1][31])))
        out.append(mul(sel_dec, y2d))
        # canonicality chain
        x2b = stack(local, COL_X2B, NA)
        xb = stack(local, COL_XB, NA)
        xc = stack(local, COL_XC, NA)
        lhs = add(x2b, xb)
        zrow = (jnp.zeros_like(xc[0][:1]), jnp.zeros_like(xc[1][:1]))
        cin = (jnp.concatenate([zrow[0], xc[0][:-1]]),
               jnp.concatenate([zrow[1], xc[1][:-1]]))
        lhs = add(lhs, cin)
        qm = np.array(QM1_LIMBS, dtype=np.uint64)
        ql_, qh_ = gl.from_u64(qm)
        rhs = add((jnp.broadcast_to(jnp.asarray(ql_)[:, None],
                                    xc[0].shape),
                   jnp.broadcast_to(jnp.asarray(qh_)[:, None],
                                    xc[1].shape)),
                  cmul(256, xc))
        e = sub(lhs, rhs)
        emit_rows(gl.mul(e[0], e[1], sel_dec[0][None], sel_dec[1][None]))
        out.append(mul(sel_dec, (xc[0][NA - 1], xc[1][NA - 1])))
        cm1 = sub(xc, (jnp.ones_like(xc[0]), jnp.zeros_like(xc[1])))
        bq = mul(xc, cm1)
        emit_rows(gl.mul(bq[0], bq[1], sel_dec[0][None], sel_dec[1][None]))

        # 8. cadd bit booleanity
        brm1 = sub(br, one)
        out.append(mul(sels["sel_cadd"], mul(br, brm1)))

        # 9. eq-row forced zeros
        d2 = (dstk[0][2], dstk[1][2])
        emit_rows(gl.mul(d2[0], d2[1], sels["sel_eq"][0][None],
                         sels["sel_eq"][1][None]))
        d5 = (dstk[0][5], dstk[1][5])
        emit_rows(gl.mul(d5[0], d5[1], sels["sel_eq"][0][None],
                         sels["sel_eq"][1][None]))

        return out
