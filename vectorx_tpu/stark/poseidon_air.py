"""Poseidon-permutation AIR: proves y = PoseidonPermute(x) in zero knowledge.

This is the first real (non-toy) AIR on the STARK stack — the same
arithmetization pattern the reference's proving stack uses for its hash
gadgets (curta AIRs recursively verified, SURVEY.md §2 E3), applied to the
exact sponge this repo's FRI Merkle caps use.

Shape: 32 rows × 12 state columns; row r holds the state entering round r
(rounds 0..29), row 30 the final state, row 31 a noop copy.  Preprocessed
columns: 12 round-constant columns + 3 round-type selectors (full /
partial / noop).  One degree-8 constraint per lane:

  sel_full·(s'ᵢ − Σⱼ Mᵢⱼ·(sⱼ+rcⱼ)⁷)
+ sel_partial·(s'ᵢ − Σⱼ Mᵢⱼ·vⱼ),  v₀=(s₀+rc₀)⁷, vⱼ=sⱼ+rcⱼ
+ sel_noop·(s'ᵢ − sᵢ)

Boundaries pin row 0 to the public input state and row 30 to the public
output.
"""

from __future__ import annotations

import numpy as np

from vectorx_tpu.field.goldilocks import P
from vectorx_tpu.hash import poseidon as pv
from vectorx_tpu.hash import poseidon_py
from vectorx_tpu.stark.air import Air

WIDTH = pv.WIDTH
ROWS = 32
HALF = pv.FULL_ROUNDS // 2


class PoseidonAir(Air):
    """One or many independent permutations in a single trace.

    Each permutation occupies a 32-row slot; row 31 of a slot has all
    selectors zero, so the transition into the next slot is unconstrained
    ("free" row) and slots stay independent.  Batching k permutations
    amortizes the proof over 32k rows — the building block for proving
    whole Merkle levels / sponge absorptions in one proof.
    """

    def comp_cache_key(self):
        # device transition reads statement data only through
        # consts/boundary values (traced) - graph shareable by shape
        from vectorx_tpu.stark.air import scalar_attrs_cache_key
        return scalar_attrs_cache_key(self)


    def __init__(self, input_state: list[int] | list[list[int]]):
        if input_state and isinstance(input_state[0], (list, tuple)):
            inputs = [list(s) for s in input_state]
        else:
            inputs = [list(input_state)]
        k = len(inputs)
        log_n = max(5, (ROWS * k - 1).bit_length())
        super().__init__(width=WIDTH, log_n=log_n, constraint_degree=8)
        assert all(len(s) == WIDTH for s in inputs)
        self.inputs = [[x % P for x in s] for s in inputs]
        self.outputs = [poseidon_py.permute(s) for s in self.inputs]
        # backwards-compatible single-permutation accessors
        self.input_state = self.inputs[0]
        self.output_state = self.outputs[0]
        self._rc = pv._OVERRIDE["rc"] or pv._generated_round_constants()
        self._mds = pv._OVERRIDE["mds"] or pv._generated_mds()

    @property
    def num_perms(self) -> int:
        return len(self.inputs)

    # -- public interface ---------------------------------------------------

    def public_inputs(self):
        out = []
        for s in self.inputs:
            out.extend(s)
        for s in self.outputs:
            out.extend(s)
        return out

    def constant_columns(self):
        cols = np.zeros((WIDTH + 3, self.n), dtype=np.uint64)
        for slot in range(self.num_perms):
            base = slot * ROWS
            for r in range(pv.N_ROUNDS):
                for j in range(WIDTH):
                    cols[j, base + r] = self._rc[r * WIDTH + j]
            for r in range(ROWS):
                if r < HALF or pv.N_ROUNDS - HALF <= r < pv.N_ROUNDS:
                    cols[WIDTH + 0, base + r] = 1      # sel_full
                elif r < pv.N_ROUNDS:
                    cols[WIDTH + 1, base + r] = 1      # sel_partial
                elif r == pv.N_ROUNDS:
                    cols[WIDTH + 2, base + r] = 1      # sel_noop (row 30)
                # row 31: all selectors zero — free transition to next slot
        # padding rows past the last slot: free (all-zero selectors)
        return cols

    def boundaries(self, public):
        out = []
        for slot in range(self.num_perms):
            base = slot * ROWS
            inp_off = slot * WIDTH
            out_off = (self.num_perms + slot) * WIDTH
            out += [(base, j, public[inp_off + j]) for j in range(WIDTH)]
            out += [(base + pv.N_ROUNDS, j, public[out_off + j])
                    for j in range(WIDTH)]
        return out

    def transition(self, alg, local, nxt, public, consts=None):
        from vectorx_tpu.stark.air import DeviceAlgebra

        if alg is DeviceAlgebra:
            return self._transition_device(local, nxt, consts)
        rc = consts[:WIDTH]
        sel_full, sel_partial, sel_noop = consts[WIDTH:WIDTH + 3]

        u = [alg.add(local[j], rc[j]) for j in range(WIDTH)]

        def pow7(x):
            x2 = alg.mul(x, x)
            x4 = alg.mul(x2, x2)
            return alg.mul(alg.mul(x4, x2), x)

        u7 = [pow7(x) for x in u]
        v = [u7[0]] + u[1:]

        def mds_row(i, vals):
            acc = None
            for j in range(WIDTH):
                term = alg.mul(alg.constant(self._mds[i][j]), vals[j])
                acc = term if acc is None else alg.add(acc, term)
            return acc

        out = []
        for i in range(WIDTH):
            full_err = alg.sub(nxt[i], mds_row(i, u7))
            part_err = alg.sub(nxt[i], mds_row(i, v))
            noop_err = alg.sub(nxt[i], local[i])
            c = alg.mul(sel_full, full_err)
            c = alg.add(c, alg.mul(sel_partial, part_err))
            c = alg.add(c, alg.mul(sel_noop, noop_err))
            out.append(c)
        return out

    def _transition_device(self, local, nxt, consts):
        """Same constraints as the scalar path, but stacked: the MDS matvec
        runs as one broadcast (12, 12, N) pass instead of 144 dispatches."""
        import jax.numpy as jnp

        from vectorx_tpu.field import goldilocks as gl

        ll = jnp.stack([c[0] for c in local])       # (12, N)
        lh = jnp.stack([c[1] for c in local])
        xl = jnp.stack([c[0] for c in nxt])
        xh = jnp.stack([c[1] for c in nxt])
        rl = jnp.stack([c[0] for c in consts[:WIDTH]])
        rh = jnp.stack([c[1] for c in consts[:WIDTH]])
        (sfl, sfh), (spl, sph), (snl, snh) = consts[WIDTH:WIDTH + 3]
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
            # out[i] = Σ_j M[i][j]·a[j]: (12_out, 12_in, N) products
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
        fel, feh = gl.sub(xl, xh, mfl, mfh)
        pel, peh = gl.sub(xl, xh, mpl, mph)
        nel, neh = gl.sub(xl, xh, ll, lh)
        tl, th = gl.mul(fel, feh, sfl[None, :], sfh[None, :])
        t2 = gl.mul(pel, peh, spl[None, :], sph[None, :])
        t3 = gl.mul(nel, neh, snl[None, :], snh[None, :])
        tl, th = gl.add(tl, th, *t2)
        tl, th = gl.add(tl, th, *t3)
        return [(tl[i], th[i]) for i in range(WIDTH)]

    # -- witness ------------------------------------------------------------

    def build_trace(self) -> np.ndarray:
        """(12, n) states entering each round, slot per permutation, with
        the scalar-oracle round structure (hash/poseidon_py.py)."""
        rc, mds = self._rc, self._mds

        def mds_layer(s):
            return [sum(mds[i][j] * s[j] for j in range(WIDTH)) % P
                    for i in range(WIDTH)]

        all_states = []
        for slot, inp in enumerate(self.inputs):
            s = list(inp)
            states = [list(s)]
            for r in range(pv.N_ROUNDS):
                s = [(x + rc[r * WIDTH + i]) % P for i, x in enumerate(s)]
                if HALF <= r < pv.N_ROUNDS - HALF:
                    s[0] = pow(s[0], pv.ALPHA, P)
                else:
                    s = [pow(x, pv.ALPHA, P) for x in s]
                s = mds_layer(s)
                states.append(list(s))
            assert s == self.outputs[slot]
            states.append(list(s))  # noop row 31
            all_states.extend(states)
        while len(all_states) < self.n:
            all_states.append([0] * WIDTH)  # free padding rows
        trace = np.array(all_states, dtype=np.uint64).T
        assert trace.shape == (WIDTH, self.n)
        return trace
