"""Verifier-VM AIR: executes a shadow-verifier tape (ssa.py) as ONE wide
STARK trace, so that verifying many child proofs becomes a single proof.

This is the TPU-native re-architecture of the reference's recursion: where
plonky2x reduce circuits verify two child proofs each and a log-depth tree
of CPU proofs aggregates leaves
(/root/reference/circuits/builder/subchain_verification.rs:233-289,
/root/reference/circuits/header_range.rs:71-88), here the whole tree of
child verifications is ROWS of one machine trace — big, regular, batched
device computation, which is what the MXU wants.

Machine model — two row families sharing one 28-column trace and an
8-port LogUp memory bus (stark/air.py `BusPort`):

* FMA rows: out = A·B + C over GF(p²), where each operand is
  `coeff·bus_read + const` with program (preprocessed) coefficient and
  constant.  An `is_assert` flag forces out = 0.  Fresh rows (witness
  inputs: proof elements, inverse hints, bits) are FMA rows with the
  compute selector off — the out port just publishes a witness value.
* Poseidon slots (32 rows): stage row absorbs ≤8 bus values into the
  sponge lanes (keeping or zeroing the rest), 30 round rows run the
  permutation (same constraint shape as stark/poseidon_air.py), and the
  final row publishes up to 8 output lanes onto the bus.

All cross-row data flow rides the bus (order-independent multiset
argument), so program scheduling is free: Poseidon chains are laid out
contiguously after the FMA program regardless of tape interleaving.

The program (selectors, operand coefficients, bus addresses and
multiplicities) lives in 36 preprocessed columns — a pure function of the
child STATEMENT, never of the proof — so the machine's preprocessed
commitment is the verification key binding exactly "this trace verifies
those child statements".
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from vectorx_tpu.field import ext_py
from vectorx_tpu.field.goldilocks import P
from vectorx_tpu.hash import poseidon as pv
from vectorx_tpu.hash import poseidon_py
from vectorx_tpu.stark.air import Air, BusPort

WIDTH = pv.WIDTH            # 12 Poseidon lanes
N_PORTS = 8
TRACE_W = WIDTH + 2 * N_PORTS   # 12 state + 8 ext port-value pairs = 28

# witness column indices
def _v0(p):
    return WIDTH + 2 * p


def _v1(p):
    return WIDTH + 2 * p + 1


# constant (preprocessed) column indices
C0 = 0                      # C0..C11: rc / absorb mask / FMA payload
SEL_FULL = 12
SEL_PARTIAL = 13
SEL_STAGE = 14
KEEP = 15
SEL_OUTW = 16
SEL_COPY = 17
SEL_FMA = 18
SEL_BIT = 19                # fresh boolean witness: V3'·(V3'−1) = 0
ADDR0 = 20                  # ADDR0+p: port address
MULT0 = 20 + N_PORTS        # MULT0+p: port multiplicity
N_CONSTS = MULT0 + N_PORTS  # 36

# FMA payload layout within C0..C11
FMA_CA = 0                  # C0, C1 = const of operand A (ext)
FMA_CB = 2
FMA_CC = 4
FMA_FA = 6                  # C6, C7, C8 = port coefficients (base)
FMA_FB = 7
FMA_FC = 8
FMA_ASSERT = 9              # C9 = is_assert flag

HALF = pv.FULL_ROUNDS // 2  # 4
SLOT_ROWS = 32


@dataclass
class _FmaRow:
    """One FMA/fresh row.  Operands: (coeff, addr, const) with addr=0 for
    a pure constant.  out_addr=0 means no bus write (pure assert)."""

    a: tuple = (0, 0, (0, 0))
    b: tuple = (0, 0, (0, 0))
    c: tuple = (0, 0, (0, 0))
    out_addr: int = 0
    is_assert: bool = False
    compute: bool = True     # False: fresh row (out unconstrained)
    is_bit: bool = False     # fresh row whose value is constrained boolean
    public_index: int = -1


@dataclass
class _Slot:
    """One Poseidon duplex as a 32-row slot."""

    buf_addrs: list          # ≤8 machine addresses absorbed into lanes 0..
    keep: bool               # keep capacity/state lanes from previous slot
    out_addrs: list          # 8 addresses for output lanes 0..7 (0 = unused)
    chain_next: bool = False # next slot continues this sponge


@dataclass
class Program:
    """Lowered machine program + (in witness mode) the value assignment."""

    items: list                      # _FmaRow | _Slot, in layout order
    n_rows: int
    reads: dict                      # machine addr -> read count
    publics: list                    # [(item value)] in public-index order
    values: dict | None              # addr -> ext pair (witness mode only)
    witness: bool


class LoweringError(Exception):
    pass


def _row_count(item) -> int:
    return SLOT_ROWS if isinstance(item, _Slot) else 1


class _Lowerer:
    """Turns an ssa.Builder tape into a machine Program.

    Deterministic function of the tape STRUCTURE: statement-mode and
    witness-mode tapes (which match node-for-node, see shadow.py) lower to
    the identical program; witness mode additionally computes the value of
    every machine address."""

    def __init__(self, builder):
        from vectorx_tpu.recursion import ssa

        self.ssa = ssa
        self.b = builder
        self.witness = builder.witness
        self.items: list = []
        self.chains: list = []        # finished duplex chains (lists of _Slot)
        self.open_chain: dict = {}    # tape duplex node idx -> (chain, slot)
        self.reads: dict = {}
        self.values: dict = {} if self.witness else None
        self.addr_of: dict = {}       # tape vid -> machine addr
        self.bit_addr: dict = {}      # BitRef -> machine addr
        self.publics: list = []
        self._next_addr = 1

    # -- helpers -------------------------------------------------------------

    def _alloc(self, value=None) -> int:
        a = self._next_addr
        self._next_addr += 1
        if self.witness:
            assert value is not None
            self.values[a] = (value[0] % P, value[1] % P)
        return a

    def _read(self, addr: int) -> int:
        self.reads[addr] = self.reads.get(addr, 0) + 1
        return addr

    def _val(self, addr: int):
        return self.values[addr] if self.witness else None

    def _emit(self, row: _FmaRow):
        # central read accounting: every port-read operand counts here
        if row.compute:
            for coeff, addr, _c in (row.a, row.b, row.c):
                if coeff and addr:
                    self._read(addr)
        self.items.append(row)

    def _operand(self, aff):
        """Lower an Affine to (coeff, addr, const); multi-term affines are
        folded into a chain of FMA rows first."""
        terms = [(self.addr_of[v], c) for v, c in aff.terms.items()]
        terms += [(self.bit_addr[r], c) for r, c in aff.bits.items()]
        const = (aff.const[0] % P, aff.const[1] % P)
        if not terms:
            return (0, 0, const)
        if len(terms) == 1:
            return (terms[0][1] % P, terms[0][0], const)
        # fold: t1 = c0·v0 + (c1·v1 + const); then t += ck·vk
        def term_val(addr, c):
            v = self.values[addr]
            return ((v[0] * c) % P, (v[1] * c) % P)

        (a0, c0), (a1, c1) = terms[0], terms[1]
        run = None
        if self.witness:
            run = ext_py.add(ext_py.add(term_val(a0, c0),
                                        term_val(a1, c1)), const)
        acc = self._alloc(run) if self.witness else self._alloc_stmt()
        self._emit(_FmaRow(a=(c0 % P, a0, (0, 0)),
                           b=(0, 0, (1, 0)),
                           c=(c1 % P, a1, const),
                           out_addr=acc))
        for addr, c in terms[2:]:
            if self.witness:
                run = ext_py.add(run, term_val(addr, c))
            nxt = self._alloc(run) if self.witness else self._alloc_stmt()
            self._emit(_FmaRow(a=(c % P, addr, (0, 0)),
                               b=(0, 0, (1, 0)),
                               c=(1, acc, (0, 0)),
                               out_addr=nxt))
            acc = nxt
        return (1, acc, (0, 0))

    def _alloc_stmt(self) -> int:
        a = self._next_addr
        self._next_addr += 1
        return a

    def _fresh_value(self, value) -> int:
        addr = self._alloc(value) if self.witness else self._alloc_stmt()
        self._emit(_FmaRow(out_addr=addr, compute=False))
        return addr

    def _fresh_bit(self, value) -> int:
        """Fresh witness constrained boolean by the row itself — one row
        instead of fresh + assert."""
        addr = self._alloc(value) if self.witness else self._alloc_stmt()
        self._emit(_FmaRow(out_addr=addr, compute=False, is_bit=True))
        return addr

    def _fma_row(self, a, b, c, out_value=None, is_assert=False):
        """Emit out = A·B + C (or assert A·B + C == 0)."""
        oa, ob, oc = self._operand(a), self._operand(b), self._operand(c)
        if is_assert:
            self._emit(_FmaRow(a=oa, b=ob, c=oc, is_assert=True))
            return 0
        addr = self._alloc(out_value) if self.witness else self._alloc_stmt()
        self._emit(_FmaRow(a=oa, b=ob, c=oc, out_addr=addr))
        return addr

    # -- tape walk -----------------------------------------------------------

    def run(self) -> Program:
        ssa = self.ssa
        for idx, node in enumerate(self.b.nodes):
            if isinstance(node, ssa.Fresh):
                val = self.b.values.get(node.out) if self.witness else None
                if node.public_index >= 0:
                    # publics known in both modes (statement data)
                    val = self.b.values[node.out]
                    addr = self._alloc_public(val)
                    self._emit(_FmaRow(out_addr=addr, compute=False,
                                       public_index=node.public_index))
                    while len(self.publics) <= node.public_index:
                        self.publics.append(None)
                    self.publics[node.public_index] = val[0]
                else:
                    addr = self._fresh_value(val)
                self.addr_of[node.out] = addr
            elif isinstance(node, ssa.Fma):
                ov = self.b.values.get(node.out) if self.witness else None
                self.addr_of[node.out] = self._fma_row(
                    node.a, node.b, node.c, out_value=ov)
            elif isinstance(node, ssa.Assert):
                self._fma_row(node.a, node.b, node.c, is_assert=True)
            elif isinstance(node, ssa.Duplex):
                self._lower_duplex(idx, node)
            elif isinstance(node, ssa.BitDec):
                self._lower_bitdec(node)
            else:
                raise LoweringError(f"unknown tape node {type(node)}")
        # flush open chains, lay poseidon slots after the FMA program
        items = list(self.items)
        for chain in self.chains:
            for k, slot in enumerate(chain):
                slot.chain_next = k + 1 < len(chain)
                items.append(slot)
        n_rows = sum(_row_count(it) for it in items)
        assert all(p is not None for p in self.publics), "public index gap"
        return Program(items=items, n_rows=n_rows, reads=self.reads,
                       publics=self.publics, values=self.values,
                       witness=self.witness)

    def _alloc_public(self, value) -> int:
        a = self._next_addr
        self._next_addr += 1
        if self.witness:
            self.values[a] = (value[0] % P, value[1] % P)
        return a

    def _lower_duplex(self, idx, node):
        buf_addrs = [self._read(self.addr_of[v]) for v in node.buf]
        out_addrs = []
        for lane, vid in enumerate(node.outs):
            if self.witness:
                addr = self._alloc(self.b.values[vid])
            else:
                addr = self._alloc_stmt()
            self.addr_of[vid] = addr
            out_addrs.append(addr)
        slot = _Slot(buf_addrs=buf_addrs, keep=node.keep_state,
                     out_addrs=out_addrs[:N_PORTS])
        # lanes 8..11 are capacity: consumers must never read them off the
        # bus (they flow to the next slot through the state columns)
        self._cap_addrs = getattr(self, "_cap_addrs", set())
        self._cap_addrs.update(out_addrs[N_PORTS:])
        if node.keep_state:
            if node.prev < 0 or node.prev not in self.open_chain:
                raise LoweringError("keep_state duplex without live prev")
            chain = self.open_chain.pop(node.prev)
            chain.append(slot)
        else:
            chain = [slot]
            self.chains.append(chain)
        self.open_chain[idx] = chain

    def _lower_bitdec(self, node):
        xaddr = self.addr_of[node.x]
        xval = self._val(xaddr)
        nbits = node.nbits
        bit_addrs = []
        for i in range(nbits):
            bv = ((xval[0] >> i) & 1) if self.witness else None
            addr = self._fresh_bit((bv, 0) if self.witness else None)
            self.bit_addr[self.ssa.BitRef(node=node.node, index=i)] = addr
            bit_addrs.append(addr)
        acc = self._recompose(bit_addrs, 0)
        # Σ 2^i·b_i == x
        self._emit(_FmaRow(a=(1, acc, (0, 0)),
                           b=(0, 0, (1, 0)),
                           c=(P - 1, xaddr, (0, 0)),
                           is_assert=True))
        if node.canonical:
            if nbits != 64:
                raise LoweringError("canonical bitdec requires 64 bits")
            self._canonical_check(bit_addrs, xval)

    def _recompose(self, bit_addrs, shift) -> int:
        """Machine addr holding Σ_i 2^i · bits[i] (weights relative to the
        slice: bit_addrs[0] has weight 1)."""
        assert len(bit_addrs) >= 2
        run = None
        if self.witness:
            run = sum(self.values[a][0] << i
                      for i, a in enumerate(bit_addrs)) % P
        acc = self._alloc((run if self.witness else 0, 0)) if self.witness \
            else self._alloc_stmt()
        if self.witness:
            v0 = self.values[bit_addrs[0]][0]
            v1 = self.values[bit_addrs[1]][0]
            first = (v0 + 2 * v1) % P
            self.values[acc] = (first, 0)
        self._emit(_FmaRow(a=(1, bit_addrs[0], (0, 0)),
                           b=(0, 0, (1, 0)),
                           c=(2, bit_addrs[1], (0, 0)),
                           out_addr=acc))
        cur = acc
        curval = self.values[acc][0] if self.witness else None
        for i, a in enumerate(bit_addrs[2:], start=2):
            w = pow(2, i, P)
            if self.witness:
                curval = (curval + w * self.values[a][0]) % P
            nxt = self._alloc((curval, 0)) if self.witness \
                else self._alloc_stmt()
            self._emit(_FmaRow(a=(w, a, (0, 0)),
                               b=(0, 0, (1, 0)),
                               c=(1, cur, (0, 0)),
                               out_addr=nxt))
            cur = nxt
        return cur

    def _canonical_check(self, bit_addrs, xval):
        """x < P for a 64-bit decomposition: if hi32 == 2^32−1 then lo32
        must be 0 (P − 1 = (2^32−1)·2^32)."""
        hi = self._recompose(bit_addrs[32:], 0)
        lo = self._recompose(bit_addrs[:32], 0)
        full = (1 << 32) - 1
        hival = self.values[hi][0] if self.witness else None
        loval = self.values[lo][0] if self.witness else None
        # diff = hi − (2^32−1)
        dval = ((hival - full) % P, 0) if self.witness else None
        diff = self._alloc(dval) if self.witness else self._alloc_stmt()
        self._emit(_FmaRow(a=(1, hi, (0, 0)),
                           b=(0, 0, (1, 0)),
                           c=(0, 0, ((P - full) % P, 0)),
                           out_addr=diff))
        zval = None
        wval = None
        if self.witness:
            zval = (1, 0) if dval[0] == 0 else (0, 0)
            wval = (0, 0) if dval[0] == 0 else (pow(dval[0], P - 2, P), 0)
        z = self._fresh_bit(zval)
        winv = self._fresh_value(wval)
        # winv·diff + z − 1 == 0  (z=0 ⟹ diff invertible ⟹ hi ≠ 2^32−1)
        self._emit(_FmaRow(a=(1, winv, (0, 0)),
                           b=(1, diff, (0, 0)),
                           c=(1, z, (P - 1, 0)),
                           is_assert=True))
        # z·lo == 0  (hi all-ones forces lo = 0)
        self._emit(_FmaRow(a=(1, z, (0, 0)),
                           b=(1, lo, (0, 0)),
                           c=(0, 0, (0, 0)),
                           is_assert=True))


def compile_tape(builder) -> Program:
    """Lower an ssa tape to a machine program (+ values in witness mode)."""
    low = _Lowerer(builder)
    prog = low.run()
    # capacity lanes must never be bus-read
    for a in getattr(low, "_cap_addrs", ()):
        if prog.reads.get(a):
            raise LoweringError("capacity lane consumed off the bus")
    return prog


class MachineAir(Air):
    """The verifier-VM AIR for one lowered program.

    Cites the recursion this replaces:
    /root/reference/circuits/builder/subchain_verification.rs:233-289 (each
    reduce node verifies two child proofs in-circuit) and
    /root/reference/circuits/header_range.rs:71-88 (MapReduceGenerator)."""

    def __init__(self, program: Program):
        rows = program.n_rows
        # n ≥ rows + 1: the last row must stay free of ports/boundaries
        log_n = max(6, rows.bit_length())
        super().__init__(width=TRACE_W, log_n=log_n, constraint_degree=8)
        self.program = program
        self._rc = pv._OVERRIDE["rc"] or pv._generated_round_constants()
        self._mds = pv._OVERRIDE["mds"] or pv._generated_mds()
        self._consts = None
        self._publics = [int(v) % P for v in program.publics]

    # -- Air interface -------------------------------------------------------

    def public_inputs(self):
        return list(self._publics)

    def bus_ports(self):
        return [BusPort(value_cols=(_v0(p), _v1(p)),
                        addr_col=ADDR0 + p, mult_col=MULT0 + p)
                for p in range(N_PORTS)]

    def constant_columns(self):
        if self._consts is not None:
            return self._consts
        n = self.n
        cols = np.zeros((N_CONSTS, n), dtype=np.uint64)
        r = 0
        reads = self.program.reads
        for it in self.program.items:
            if isinstance(it, _FmaRow):
                if it.is_bit:
                    cols[SEL_BIT, r] = 1
                if it.compute:
                    cols[SEL_FMA, r] = 1
                    (fa, aa, ca), (fb, ab, cb), (fc, ac, cc) = \
                        it.a, it.b, it.c
                    cols[C0 + FMA_CA, r] = ca[0]
                    cols[C0 + FMA_CA + 1, r] = ca[1]
                    cols[C0 + FMA_CB, r] = cb[0]
                    cols[C0 + FMA_CB + 1, r] = cb[1]
                    cols[C0 + FMA_CC, r] = cc[0]
                    cols[C0 + FMA_CC + 1, r] = cc[1]
                    cols[C0 + FMA_FA, r] = fa
                    cols[C0 + FMA_FB, r] = fb
                    cols[C0 + FMA_FC, r] = fc
                    cols[C0 + FMA_ASSERT, r] = 1 if it.is_assert else 0
                    for p, (coeff, addr, _c) in enumerate(
                            (it.a, it.b, it.c)):
                        if coeff and addr:
                            cols[ADDR0 + p, r] = addr
                            cols[MULT0 + p, r] = P - 1      # read
                if it.out_addr and reads.get(it.out_addr, 0):
                    cols[ADDR0 + 3, r] = it.out_addr
                    cols[MULT0 + 3, r] = reads[it.out_addr]  # write
                r += 1
            else:  # _Slot
                base = r
                cols[SEL_STAGE, base] = 1
                cols[KEEP, base] = 1 if it.keep else 0
                for lane, addr in enumerate(it.buf_addrs):
                    cols[C0 + lane, base] = 1                # absorb mask
                    cols[ADDR0 + lane, base] = addr
                    cols[MULT0 + lane, base] = P - 1         # read
                for k in range(pv.N_ROUNDS):
                    rr = base + 1 + k
                    for j in range(WIDTH):
                        cols[C0 + j, rr] = self._rc[k * WIDTH + j]
                    if k < HALF or k >= pv.N_ROUNDS - HALF:
                        cols[SEL_FULL, rr] = 1
                    else:
                        cols[SEL_PARTIAL, rr] = 1
                outw = base + pv.N_ROUNDS                    # row 30
                cols[SEL_OUTW, outw] = 1
                for p, addr in enumerate(it.out_addrs):
                    if addr and reads.get(addr, 0):
                        cols[ADDR0 + p, outw] = addr
                        cols[MULT0 + p, outw] = reads[addr]  # write
                if it.chain_next:
                    cols[SEL_COPY, base + SLOT_ROWS - 1] = 1
                r += SLOT_ROWS
        assert r == self.program.n_rows
        self._consts = cols
        return cols

    def boundaries(self, public):
        out = []
        r = 0
        pi = 0
        for it in self.program.items:
            if isinstance(it, _FmaRow):
                if it.public_index >= 0:
                    out.append((r + 1, _v0(3), public[it.public_index]))
                    out.append((r + 1, _v1(3), 0))
                    pi += 1
                r += 1
            else:
                r += SLOT_ROWS
        return out

    # -- constraints ----------------------------------------------------------

    def transition(self, alg, local, nxt, public, consts=None):
        from vectorx_tpu.stark.air import DeviceAlgebra

        if alg is DeviceAlgebra:
            return self._transition_device(local, nxt, consts)
        W_EXT = 7  # x² = 7 (field/extension.py)
        S = local[:WIDTH]
        Sn = nxt[:WIDTH]
        rc = consts[C0:C0 + WIDTH]
        sel_full, sel_partial = consts[SEL_FULL], consts[SEL_PARTIAL]
        sel_stage, keep = consts[SEL_STAGE], consts[KEEP]
        sel_outw, sel_copy = consts[SEL_OUTW], consts[SEL_COPY]
        sel_fma = consts[SEL_FMA]
        one = alg.constant(1)

        def pow7(x):
            x2 = alg.mul(x, x)
            x4 = alg.mul(x2, x2)
            return alg.mul(alg.mul(x4, x2), x)

        u = [alg.add(S[j], rc[j]) for j in range(WIDTH)]
        u7 = [pow7(x) for x in u]
        v = [u7[0]] + u[1:]

        def mds_row(i, vals):
            acc = None
            for j in range(WIDTH):
                t = alg.mul(alg.constant(self._mds[i][j]), vals[j])
                acc = t if acc is None else alg.add(acc, t)
            return acc

        out = []
        for i in range(WIDTH):
            c = alg.mul(sel_full, alg.sub(Sn[i], mds_row(i, u7)))
            c = alg.add(c, alg.mul(sel_partial,
                                   alg.sub(Sn[i], mds_row(i, v))))
            c = alg.add(c, alg.mul(sel_copy, alg.sub(Sn[i], S[i])))
            # stage: S'_i = am_i·V0'_i + keep·(1−am_i)·S_i  (am_i = C_i)
            am = consts[C0 + i]
            stay = alg.mul(keep, alg.mul(alg.sub(one, am), S[i]))
            absorbed = alg.mul(am, nxt[_v0(i)]) if i < N_PORTS \
                else alg.constant(0)
            c = alg.add(c, alg.mul(sel_stage,
                                   alg.sub(Sn[i], alg.add(absorbed, stay))))
            out.append(c)

        # FMA: V3' = A·B + C over GF(p²); operands op = f·Vp' + const
        fa, fb, fc = consts[C0 + FMA_FA], consts[C0 + FMA_FB], \
            consts[C0 + FMA_FC]
        ca = (consts[C0 + FMA_CA], consts[C0 + FMA_CA + 1])
        cb = (consts[C0 + FMA_CB], consts[C0 + FMA_CB + 1])
        cc = (consts[C0 + FMA_CC], consts[C0 + FMA_CC + 1])
        isa = consts[C0 + FMA_ASSERT]

        def op(f, c, p):
            return (alg.add(alg.mul(f, nxt[_v0(p)]), c[0]),
                    alg.add(alg.mul(f, nxt[_v1(p)]), c[1]))

        A = op(fa, ca, 0)
        B = op(fb, cb, 1)
        C = op(fc, cc, 2)
        ab0 = alg.add(alg.mul(A[0], B[0]),
                      alg.mul(alg.constant(W_EXT), alg.mul(A[1], B[1])))
        ab1 = alg.add(alg.mul(A[0], B[1]), alg.mul(A[1], B[0]))
        out.append(alg.mul(sel_fma, alg.sub(nxt[_v0(3)],
                                            alg.add(ab0, C[0]))))
        out.append(alg.mul(sel_fma, alg.sub(nxt[_v1(3)],
                                            alg.add(ab1, C[1]))))
        out.append(alg.mul(sel_fma, alg.mul(isa, nxt[_v0(3)])))
        out.append(alg.mul(sel_fma, alg.mul(isa, nxt[_v1(3)])))
        sel_bit = consts[SEL_BIT]
        out.append(alg.mul(sel_bit, alg.mul(nxt[_v0(3)],
                                            alg.sub(nxt[_v0(3)], one))))
        out.append(alg.mul(sel_bit, nxt[_v1(3)]))

        # port hygiene: absorbed / published values are base field; outputs
        # wired to the state
        for p in range(N_PORTS):
            am = consts[C0 + p]
            z = alg.mul(sel_stage, alg.mul(am, nxt[_v1(p)]))
            z = alg.add(z, alg.mul(sel_outw, nxt[_v1(p)]))
            out.append(z)
            out.append(alg.mul(sel_outw, alg.sub(nxt[_v0(p)], Sn[p])))
        return out

    def _transition_device(self, local, nxt, consts):
        """Stacked device path — same constraints, batched over the LDE
        domain with the MDS matvec as one (12,12,N) pass (cf.
        stark/poseidon_air.py::_transition_device)."""
        import jax.numpy as jnp

        from vectorx_tpu.field import goldilocks as gl

        ll = jnp.stack([c[0] for c in local[:WIDTH]])
        lh = jnp.stack([c[1] for c in local[:WIDTH]])
        xl = jnp.stack([c[0] for c in nxt[:WIDTH]])
        xh = jnp.stack([c[1] for c in nxt[:WIDTH]])
        rl = jnp.stack([c[0] for c in consts[C0:C0 + WIDTH]])
        rh = jnp.stack([c[1] for c in consts[C0:C0 + WIDTH]])
        sel = {k: consts[k] for k in (SEL_FULL, SEL_PARTIAL, SEL_STAGE,
                                      KEEP, SEL_OUTW, SEL_COPY, SEL_FMA)}
        mds = np.array(self._mds, dtype=np.uint64)
        ml = (mds & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        mh = (mds >> np.uint64(32)).astype(np.uint32)

        ul, uh = gl.add(ll, lh, rl, rh)
        s2 = gl.mul(ul, uh, ul, uh)
        s4 = gl.mul(*s2, *s2)
        s6 = gl.mul(*s4, *s2)
        u7l, u7h = gl.mul(*s6, ul, uh)
        vl = jnp.concatenate([u7l[:1], ul[1:]])
        vh = jnp.concatenate([u7h[:1], uh[1:]])

        def mds_mat(al, ah):
            pl, ph = gl.mul(al[None, :, :], ah[None, :, :],
                            ml[:, :, None], mh[:, :, None])
            while pl.shape[1] > 1:
                half = pl.shape[1] // 2
                sl_, sh_ = gl.add(pl[:, :half], ph[:, :half],
                                  pl[:, half:2 * half], ph[:, half:2 * half])
                if pl.shape[1] % 2:
                    sl_ = jnp.concatenate([sl_, pl[:, -1:]], axis=1)
                    sh_ = jnp.concatenate([sh_, ph[:, -1:]], axis=1)
                pl, ph = sl_, sh_
            return pl[:, 0], ph[:, 0]

        mfl, mfh = mds_mat(u7l, u7h)
        mpl, mph = mds_mat(vl, vh)
        out = []
        # lane constraints
        fel, feh = gl.sub(xl, xh, mfl, mfh)
        pel, peh = gl.sub(xl, xh, mpl, mph)
        cel, ceh = gl.sub(xl, xh, ll, lh)
        tl, th = gl.mul(fel, feh, sel[SEL_FULL][0][None], sel[SEL_FULL][1][None])
        t2 = gl.mul(pel, peh, sel[SEL_PARTIAL][0][None], sel[SEL_PARTIAL][1][None])
        t3 = gl.mul(cel, ceh, sel[SEL_COPY][0][None], sel[SEL_COPY][1][None])
        tl, th = gl.add(tl, th, *t2)
        tl, th = gl.add(tl, th, *t3)
        # stage term
        aml = jnp.stack([consts[C0 + i][0] for i in range(WIDTH)])
        amh = jnp.stack([consts[C0 + i][1] for i in range(WIDTH)])
        v0l = jnp.stack([nxt[_v0(i)][0] if i < N_PORTS else
                         jnp.zeros_like(xl[0]) for i in range(WIDTH)])
        v0h = jnp.stack([nxt[_v0(i)][1] if i < N_PORTS else
                         jnp.zeros_like(xh[0]) for i in range(WIDTH)])
        absorbed = gl.mul(aml, amh, v0l, v0h)
        one_m_am = gl.sub(jnp.uint32(1), jnp.uint32(0), aml, amh)
        stay = gl.mul(*gl.mul(*one_m_am, ll, lh),
                      sel[KEEP][0][None], sel[KEEP][1][None])
        st = gl.sub(xl, xh, *gl.add(*absorbed, *stay))
        st = gl.mul(*st, sel[SEL_STAGE][0][None], sel[SEL_STAGE][1][None])
        tl, th = gl.add(tl, th, *st)
        out.extend((tl[i], th[i]) for i in range(WIDTH))

        # FMA constraints
        def cst(i):
            return consts[C0 + i]

        def op_dev(fi, c0i, p):
            f = cst(fi)
            o0 = gl.add(*gl.mul(*f, *nxt[_v0(p)]), *cst(c0i))
            o1 = gl.add(*gl.mul(*f, *nxt[_v1(p)]), *cst(c0i + 1))
            return o0, o1

        A0, A1 = op_dev(FMA_FA, FMA_CA, 0)
        B0, B1 = op_dev(FMA_FB, FMA_CB, 1)
        C0_, C1_ = op_dev(FMA_FC, FMA_CC, 2)
        ab0 = gl.add(*gl.mul(*A0, *B0), *gl.mul_small(*gl.mul(*A1, *B1), 7))
        ab1 = gl.add(*gl.mul(*A0, *B1), *gl.mul(*A1, *B0))
        sf = sel[SEL_FMA]
        e0 = gl.sub(*nxt[_v0(3)], *gl.add(*ab0, *C0_))
        e1 = gl.sub(*nxt[_v1(3)], *gl.add(*ab1, *C1_))
        out.append(gl.mul(*e0, *sf))
        out.append(gl.mul(*e1, *sf))
        isa = gl.mul(*cst(FMA_ASSERT), *sf)
        out.append(gl.mul(*isa, *nxt[_v0(3)]))
        out.append(gl.mul(*isa, *nxt[_v1(3)]))
        sb = consts[SEL_BIT]
        v30 = nxt[_v0(3)]
        bm1 = gl.sub(*v30, jnp.uint32(1), jnp.uint32(0))
        out.append(gl.mul(*gl.mul(*v30, *bm1), *sb))
        out.append(gl.mul(*sb, *nxt[_v1(3)]))

        so = sel[SEL_OUTW]
        ss = sel[SEL_STAGE]
        for p in range(N_PORTS):
            am = cst(p)
            z1 = gl.mul(*gl.mul(*ss, *am), *nxt[_v1(p)])
            z2 = gl.mul(*so, *nxt[_v1(p)])
            out.append(gl.add(*z1, *z2))
            out.append(gl.mul(*so, *gl.sub(*nxt[_v0(p)], xl[p], xh[p])))
        return out

    # -- witness --------------------------------------------------------------

    def build_trace(self) -> np.ndarray:
        prog = self.program
        assert prog.witness, "trace requires a witness-mode program"
        vals = prog.values
        tr = np.zeros((TRACE_W, self.n), dtype=np.uint64)

        def setv(row, p, addr):
            v = vals[addr]
            tr[_v0(p), row] = v[0]
            tr[_v1(p), row] = v[1]

        r = 0
        prev_state = None
        for it in prog.items:
            if isinstance(it, _FmaRow):
                if it.compute:
                    for p, (coeff, addr, _c) in enumerate(
                            (it.a, it.b, it.c)):
                        if coeff and addr:
                            setv(r + 1, p, addr)
                    if it.is_assert:
                        pass  # V3' stays 0 == asserted value
                    else:
                        setv(r + 1, 3, it.out_addr)
                else:
                    setv(r + 1, 3, it.out_addr)
                r += 1
            else:
                base = r
                state = list(prev_state) if it.keep and prev_state else \
                    [0] * WIDTH
                tr[:WIDTH, base] = state            # stage row state
                for lane, addr in enumerate(it.buf_addrs):
                    v = vals[addr]
                    assert v[1] == 0
                    state[lane] = v[0]
                    setv(base + 1, lane, addr)
                # round-by-round states on rows base+1 .. base+31
                rc, mds = self._rc, self._mds
                s = list(state)
                tr[:WIDTH, base + 1] = s
                for k in range(pv.N_ROUNDS):
                    s = [(x + rc[k * WIDTH + j]) % P
                         for j, x in enumerate(s)]
                    if HALF <= k < pv.N_ROUNDS - HALF:
                        s[0] = pow(s[0], pv.ALPHA, P)
                    else:
                        s = [pow(x, pv.ALPHA, P) for x in s]
                    s = [sum(mds[i][j] * s[j] for j in range(WIDTH)) % P
                         for i in range(WIDTH)]
                    tr[:WIDTH, base + 2 + k] = s
                # the outw wiring constraint pins ALL port values to the
                # state on the final row, active write ports or not
                for p in range(N_PORTS):
                    tr[_v0(p), base + SLOT_ROWS - 1] = s[p]
                    tr[_v1(p), base + SLOT_ROWS - 1] = 0
                for p, addr in enumerate(it.out_addrs):
                    if addr and prog.reads.get(addr, 0):
                        assert vals[addr] == (s[p], 0)
                prev_state = s
                r += SLOT_ROWS
        return tr
