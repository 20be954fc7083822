"""Benchmark driver: Goldilocks NTT throughput on the TPU chip.

Prints ONE JSON line:
  {"metric": "goldilocks_ntt", "value": <Gelem/s/chip>, "unit": "Gelem/s",
   "vs_baseline": <value / 1.0>, "extras": {...}}

The reference publishes no benchmark numbers (BASELINE.md), so
`vs_baseline` measures against the repo's speed-of-light anchor of
1.0 Gelem/s/chip for the radix-2 NTT (BASELINE.json north-star metric #1).

Robustness (round-2 lesson: the remote-TPU tunnel can HANG during backend
init, not fail): the benchmark body runs in a SUBPROCESS with a hard
timeout.  TPU is attempted with retries/backoff; if every attempt times
out or errors, the same benchmark re-runs on CPU and the emitted record is
explicitly marked degraded with the TPU diagnostics attached.  This driver
always prints a JSON line and always exits 0.

Methodology: the remote-TPU tunnel costs ~26 ms per dispatch, so every
kernel is timed as the MARGINAL cost of extra in-jit iterations
(time(k=K) − time(k=1)) / (K − 1), with a scalar checksum fetched each call
to force completion (block_until_ready alone does not sync this backend).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

# Round-4 lesson (VERDICT weak #6): the worst-case attempt schedule
# (2×1800 s TPU + 900 s CPU) exceeded the driver's kill window, so the
# checkpointed partials were never PRINTED and the round recorded nothing
# (BENCH_r04.json rc=124).  The fix is a GLOBAL wall-clock budget smaller
# than any plausible observer window: one TPU attempt sized to the
# remaining budget, then a CPU fallback in whatever time is left, and the
# JSON line always printed before the budget expires.
TOTAL_BUDGET_S = int(os.environ.get("VECTORX_BENCH_BUDGET_S", "900"))
CPU_RESERVE_S = 180          # kept back for the CPU fallback + printing
_START = time.monotonic()


def _remaining() -> float:
    return TOTAL_BUDGET_S - (time.monotonic() - _START)


def _run_body(out_path: str, platform: str, deadline_s: float = 1e18) -> None:
    """Child process: run the benchmark and write its JSON to out_path.
    `deadline_s` (monotonic): slow sections are SKIPPED (recorded as such)
    once the budget runs low, so the record is complete-as-possible and
    written before the parent's timeout fires."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    def _left():
        return deadline_s - time.monotonic()

    from vectorx_tpu.jaxcache import enable_persistent_cache

    enable_persistent_cache()   # host-keyed: a retry attempt reuses compiles

    # force backend init NOW and signal liveness: the remote-TPU tunnel's
    # failure mode is a silent HANG here (round-2 lesson, seen again in
    # round 5) — the parent probes for this file to distinguish "backend
    # hung at init" (kill + retry fast) from "benchmark is just slow"
    jnp.zeros(8).block_until_ready()
    with open(out_path + ".alive", "w") as f:
        f.write(str(time.time()))

    from vectorx_tpu.field import goldilocks as gl
    from vectorx_tpu.hash import poseidon
    from vectorx_tpu.hash.blake2b import blake2b_batch
    from vectorx_tpu.ntt import ntt

    def _timed(f, *args, iters=7):
        """Min-of-N timing: the remote tunnel adds noisy per-call latency,
        so the minimum is the reliable estimator of the compute cost."""
        s = int(f(*args))  # warm + compile + sync
        best = float("inf")
        for _ in range(iters):
            t0 = time.perf_counter()
            s = int(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best, s

    rng = np.random.default_rng(0)
    extras = {"platform": platform}

    # --- NTT throughput (north-star metric #1) -----------------------------
    # The XLA-pinned path times FIRST: it is warm in every cache and its
    # number lands in the durable record before the Pallas section, whose
    # Mosaic compiles can be slow on a cold remote-compile server (the
    # round-5 warm run burned its whole TPU budget there and recorded
    # nothing).  The gated/Pallas number upgrades the headline afterwards.
    big = platform == "tpu"
    B, log_n = (64, 16) if big else (8, 14)
    n = 1 << log_n
    poly = rng.integers(0, gl.P, size=(B, n), dtype=np.uint64)
    pl_, ph_ = gl.from_u64(poly)
    from vectorx_tpu.ntt.ntt import _transform_xla, _use_pallas

    def xla_reps(lo, hi, k):
        for _ in range(k):
            lo, hi = _transform_xla(lo, hi, log_n, False)
        return jnp.sum(lo, dtype=jnp.uint32)

    K = 5
    f1 = jax.jit(lambda a, b: xla_reps(a, b, 1))
    fK = jax.jit(lambda a, b: xla_reps(a, b, K))
    t1, _ = _timed(f1, pl_, ph_)
    tK, _ = _timed(fK, pl_, ph_)
    ntt_ms = (tK - t1) / (K - 1) * 1e3
    ntt_gelems = B * n / (ntt_ms / 1e3) / 1e9
    extras["ntt_batch"] = B
    extras["ntt_log_n"] = log_n
    extras["ntt_ms"] = round(ntt_ms, 3)
    extras["ntt_impl"] = "xla"
    extras["dispatch_overhead_ms"] = round(t1 * 1e3 - ntt_ms, 1)

    # --- Poseidon permutation throughput -----------------------------------
    H = 1 << (16 if big else 13)
    st = rng.integers(0, gl.P, size=(H, 12), dtype=np.uint64)
    sl, sh = gl.from_u64(st)

    def pos_reps(lo, hi, k):
        for _ in range(k):
            lo, hi = poseidon.permute(lo, hi)
        return jnp.sum(lo, dtype=jnp.uint32)

    f1 = jax.jit(lambda a, b: pos_reps(a, b, 1))
    fK = jax.jit(lambda a, b: pos_reps(a, b, K))
    t1, _ = _timed(f1, sl, sh)
    tK, _ = _timed(fK, sl, sh)
    perm_ms = (tK - t1) / (K - 1) * 1e3
    extras["poseidon_permutations_per_s"] = round(H / (perm_ms / 1e3))

    # --- Blake2b header hashing (2 KB headers, end-to-end incl. transfer) --
    HB, L = (2048, 2048) if big else (256, 2048)
    msgs = rng.integers(0, 256, size=(HB, L), dtype=np.uint8)
    lens = np.full(HB, L, dtype=np.uint32)
    blake2b_batch(msgs, lens)  # warm
    t0 = time.perf_counter()
    blake2b_batch(msgs, lens)  # np conversion inside forces sync
    dt = time.perf_counter() - t0
    extras["blake2b_2kb_headers_per_s"] = round(HB / dt)
    extras["device"] = str(jax.devices()[0])

    def _write():
        with open(out_path + ".tmp", "w") as f:
            json.dump({
                "metric": "goldilocks_ntt",
                "value": round(ntt_gelems, 4),
                "unit": "Gelem/s",
                "vs_baseline": round(ntt_gelems / 1.0, 4),
                "extras": extras,
            }, f)
        os.replace(out_path + ".tmp", out_path)

    _write()   # base record is durable before the slow sections

    # --- gated NTT path (the SHIPPED config: Pallas default-on at
    # log_n >= PALLAS_MIN_LOG_N, evidence/pallas_ntt.json).  If it wins,
    # it becomes the headline value; a compile timeout here cannot cost
    # the base record. ---------------------------------------------------
    if big and _use_pallas(log_n) and _left() > 180:
        try:
            def gated_reps(lo, hi, k):
                for _ in range(k):
                    lo, hi = ntt(lo, hi)
                return jnp.sum(lo, dtype=jnp.uint32)

            g1 = jax.jit(lambda a, b: gated_reps(a, b, 1))
            gK = jax.jit(lambda a, b: gated_reps(a, b, K))
            ref_l, ref_h = _transform_xla(pl_, ph_, log_n, False)
            out_l, out_h = ntt(pl_, ph_)
            exact = (bool(jnp.array_equal(out_l, ref_l))
                     and bool(jnp.array_equal(out_h, ref_h)))
            t1p, _ = _timed(g1, pl_, ph_)
            tKp, _ = _timed(gK, pl_, ph_)
            pal_ms = (tKp - t1p) / (K - 1) * 1e3
            pal_gelems = B * n / (pal_ms / 1e3) / 1e9
            extras["ntt_pallas_ms"] = round(pal_ms, 3)
            extras["ntt_pallas_gelem_s"] = round(pal_gelems, 4)
            extras["ntt_pallas_bit_exact"] = exact
            extras["ntt_pallas_speedup_vs_xla"] = round(ntt_ms / pal_ms, 2)
            if exact and pal_gelems > ntt_gelems:
                ntt_gelems = pal_gelems
                extras["ntt_ms"] = round(pal_ms, 3)
                extras["ntt_impl"] = "pallas (default dispatch)"
        except Exception as e:  # noqa: BLE001 — kernel path is best-effort
            extras["ntt_pallas_error"] = f"{type(e).__name__}: {e}"
        _write()

    # --- STARK AIR prove throughput at PRODUCTION FRI security ------------
    # (round-4: the staged device-resident prover; round-3 numbers to beat:
    # 1.1 rows/s Blake2b, header_range_256 est 0.007 proofs/hr).  Cold =
    # first prove on this shape (compile-inclusive); warm = second prove
    # with fresh witness, the steady-state operator cadence number.
    if _left() < 240:
        extras["air_bench_skipped"] = f"budget ({int(_left())}s left)"
        _write()
        return
    try:
        from vectorx_tpu.fri.fri import FriConfig
        from vectorx_tpu.stark.blake2b_air import SECTION as B2S
        from vectorx_tpu.stark.blake2b_air import Blake2bAir
        from vectorx_tpu.stark.prover import StarkConfig
        from vectorx_tpu.stark.prover import prove as stark_prove
        from vectorx_tpu.stark.verifier import verify as stark_verify

        fri = FriConfig()            # production defaults: 28q / 16 pow bits
        cfgp = StarkConfig(fri=fri)
        extras["air_fri"] = (f"q{fri.num_queries}/pow{fri.pow_bits}/"
                             f"rate{1 << fri.rate_bits}")

        def mk_hdr():
            return bytes(rng.integers(0, 256, size=2048 if big else 144,
                                      dtype=np.uint8).tolist())

        cold_air = Blake2bAir([mk_hdr()])
        t0 = time.perf_counter()
        pr = stark_prove(cold_air, cold_air.build_trace(), cfgp)
        cold_s = time.perf_counter() - t0
        pair_air = Blake2bAir([mk_hdr()])
        tr = pair_air.build_trace()
        t0 = time.perf_counter()
        pr = stark_prove(pair_air, tr, cfgp)
        prove_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        okv = stark_verify(pair_air, pr, cfgp)
        verify_s = time.perf_counter() - t0
        assert okv
        rows_per_s = pair_air.n / prove_s
        extras["blake2b_air_rows"] = pair_air.n
        extras["blake2b_air_cold_prove_s"] = round(cold_s, 1)
        extras["blake2b_air_prove_s"] = round(prove_s, 2)
        extras["blake2b_air_verify_s"] = round(verify_s, 1)
        extras["air_prove_rows_per_s"] = round(rows_per_s, 1)
        # header_range_256 estimate from measured component rows (BASELINE
        # metric, children only — the aggregation machine proof is extra;
        # composed artifacts: evidence/prod_flagships.json and
        # evidence/succinct_flagships.json)
        hdr_rows = 256 * (B2S * 16 + 1)            # 256 × 2 KB headers
        tree_rows = 2 * 255 * (65 * 2 + 1)         # 2 trees × 255 SHA nodes
        commit_rows = 300 * (65 * 2 + 1)           # authority-set chain
        sig_rows = 300 * (1016 + 81 * 2 + 1)       # ladder + SHA-512 msgs
        total_rows = hdr_rows + tree_rows + commit_rows + sig_rows
        est_s = total_rows / rows_per_s
        extras["header_range_256_component_rows"] = total_rows
        extras["header_range_256_proofs_per_hr_est"] = round(3600 / est_s, 3)
        _write()
    except Exception as e:  # noqa: BLE001 — AIR section is best-effort
        extras["air_bench_error"] = f"{type(e).__name__}: {e}"
        _write()

    # --- verifier-VM machine AIR throughput (the aggregation layer) -------
    # One machine trace proves a full child STARK verification
    # (recursion/machine.py).  Rows/s here bounds how fast component
    # proofs can be folded into the ONE succinct artifact.
    if _left() < 180:
        extras["machine_bench_skipped"] = f"budget ({int(_left())}s left)"
        _write()
        return
    try:
        from vectorx_tpu.recursion.machine import MachineAir, compile_tape
        from vectorx_tpu.recursion.shadow import verifier_tape
        from vectorx_tpu.recursion.ssa import Builder
        from vectorx_tpu.stark import FibonacciAir

        from vectorx_tpu.recursion import progcache

        child = FibonacciAir(log_n=6)
        child_pr = stark_prove(child, child.build_trace(), cfgp)
        b = Builder(witness=True)
        verifier_tape(b, child, cfgp, proof=child_pr)
        mprog = compile_tape(b)
        # key the program as the product verifiers do (progcache), so the
        # verify below exercises the gateway steady-state VK-token path
        progcache.put(progcache.digest_key(
            "bench-machine", mprog.n_rows, fri.num_queries), mprog)
        mair = MachineAir(mprog)
        mtr = mair.build_trace()
        t0 = time.perf_counter()
        mpr = stark_prove(mair, mtr, cfgp)
        m_cold_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        mpr = stark_prove(mair, mtr, cfgp)
        m_prove_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        assert stark_verify(mair, mpr, cfgp)
        m_verify_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        assert stark_verify(mair, mpr, cfgp)
        m_warm_verify_s = time.perf_counter() - t0
        extras["machine_air_warm_verify_s"] = round(m_warm_verify_s, 2)
        extras["machine_air_rows"] = mair.n
        extras["machine_air_cold_prove_s"] = round(m_cold_s, 1)
        extras["machine_air_prove_s"] = round(m_prove_s, 2)
        extras["machine_air_verify_s"] = round(m_verify_s, 1)
        extras["machine_air_rows_per_s"] = round(mair.n / m_prove_s, 1)
        _write()
    except Exception as e:  # noqa: BLE001 — best-effort
        extras["machine_bench_error"] = f"{type(e).__name__}: {e}"
        _write()

    # --- Pippenger MSM (BASELINE north-star metric #2 partner) ------------
    # 301-point MSM ≙ witness-side aggregation for a 300-sig GRANDPA batch
    # (reference justification.rs:237-243 scale); full crossover study in
    # evidence/msm.json (drive_msm.py).
    if _left() < 120:
        extras["msm_bench_skipped"] = f"budget ({int(_left())}s left)"
        _write()
        return
    try:
        from vectorx_tpu.curves import ed25519 as ed
        from vectorx_tpu.curves import ed25519_batch as eb

        nsigs = 300 if big else 8          # 300 = reference batch size
        msg = b"\x01" + b"\x42" * 32 + (20).to_bytes(4, "little") \
            + (7).to_bytes(8, "little") + (1).to_bytes(8, "little")
        pubkeys, msgs_l, sigs = [], [], []
        for i in range(nsigs):
            secret = (i + 1).to_bytes(4, "little") * 8
            pubkeys.append(ed.public_key(secret))
            msgs_l.append(msg)
            sigs.append(ed.sign(secret, msg))
        fixed_rng = (lambda: 0x5a5a5a5a5a5a5a5a5a5a5a5a5a5a5a5a)

        def run_msm():
            return eb.batch_verify(pubkeys, msgs_l, sigs, rng=fixed_rng,
                                   method="msm")

        t0 = time.perf_counter()
        assert run_msm()
        msm_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        assert run_msm()
        msm_s = time.perf_counter() - t0
        npts = 2 * nsigs + 1
        extras["msm_sigs"] = nsigs
        extras["msm_points"] = npts
        extras["msm_cold_s"] = round(msm_cold, 1)
        extras["msm_verify_s"] = round(msm_s, 2)
        extras["msm_points_per_s"] = round(npts / msm_s, 1)
        _write()
    except Exception as e:  # noqa: BLE001 — best-effort
        extras["msm_bench_error"] = f"{type(e).__name__}: {e}"
        _write()


def _partial(out_path: str, diag: str):
    """A failed attempt may still have checkpointed a usable record."""
    try:
        if os.path.getsize(out_path) > 0:
            with open(out_path) as f:
                rec = json.load(f)
            rec["extras"]["partial"] = diag
            return rec, None
    except (OSError, ValueError):
        pass
    return None, diag


HANG_PROBE_S = 330      # backend init is normally 30-60 s, but a claim
                        # queued behind a dead session's stale lease has
                        # been observed to take ~190 s to be granted


def _attempt(platform: str, timeout_s: int):
    """Run the benchmark body in a subprocess.  Returns (record|None, diag).

    A liveness file written by the body right after backend init lets the
    parent distinguish a hung tunnel (no liveness after HANG_PROBE_S →
    kill early so the budget is spent on a retry, not on the hang) from a
    slow-but-running benchmark."""
    env = dict(os.environ)
    if platform == "cpu":
        env["JAX_PLATFORMS"] = "cpu"
        env["PALLAS_AXON_POOL_IPS"] = ""   # skip the exclusive TPU claim
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tf:
        out_path = tf.name
    proc = None
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--body",
             out_path, platform, str(max(30, timeout_s - 15))],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        t0 = time.monotonic()
        while True:
            rc = proc.poll()
            waited = time.monotonic() - t0
            if rc is not None:
                break
            if waited >= timeout_s:
                proc.kill()
                proc.wait()
                return _partial(out_path,
                                f"timeout after {timeout_s}s")
            if waited >= HANG_PROBE_S \
                    and not os.path.exists(out_path + ".alive"):
                proc.kill()
                proc.wait()
                return None, (f"backend never initialized within "
                              f"{HANG_PROBE_S}s (tunnel hang)")
            time.sleep(2)
        if rc == 0 and os.path.getsize(out_path) > 0:
            with open(out_path) as f:
                return json.load(f), None
        tail = proc.stderr.read().decode(errors="replace")[-800:]
        return _partial(out_path, f"rc={rc}: {tail}")
    except Exception as e:  # noqa: BLE001 — diagnostics, never a crash
        return None, f"{type(e).__name__}: {e}"
    finally:
        if proc is not None and proc.poll() is None:
            proc.kill()
        for suffix in ("", ".alive"):
            try:
                os.unlink(out_path + suffix)
            except OSError:
                pass


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--body":
        budget = float(sys.argv[4]) if len(sys.argv) > 4 else 1e18
        _run_body(sys.argv[2], sys.argv[3],
                  deadline_s=time.monotonic() + budget)
        return

    diags = []
    tpu_budget = max(60, int(_remaining() - CPU_RESERVE_S))
    record, diag = _attempt("tpu", tpu_budget)
    if record is None and _remaining() - CPU_RESERVE_S >= 300:
        # first attempt died without ANY record (hang-probe kill or early
        # crash): one retry with whatever budget is left
        diags.append(f"tpu ({tpu_budget}s budget): {diag}")
        tpu_budget = max(60, int(_remaining() - CPU_RESERVE_S))
        record, diag = _attempt("tpu", tpu_budget)
    if record is None:
        diags.append(f"tpu ({tpu_budget}s budget): {diag}")
        cpu_budget = max(30, int(_remaining() - 20))
        record, diag = _attempt("cpu", cpu_budget)
        if record is not None:
            record["extras"]["degraded"] = True
            record["extras"]["tpu_diagnostics"] = diags
        else:
            diags.append(f"cpu ({cpu_budget}s budget): {diag}")
            record = {"metric": "goldilocks_ntt", "value": 0.0,
                      "unit": "Gelem/s", "vs_baseline": 0.0,
                      "extras": {"degraded": True, "error": diags}}
    record.setdefault("extras", {})["bench_wall_s"] = round(
        time.monotonic() - _START, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
