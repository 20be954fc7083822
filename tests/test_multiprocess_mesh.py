"""Multi-process CPU mesh: the DCN code path in simulation.

`scheduler.init_distributed` wraps jax.distributed for real pod slices
(BASELINE.md 2-host story); nothing in this environment has more than one
accelerator, but jax supports multi-PROCESS CPU meshes, so this test
drives the exact initialization + cross-process collective path with two
local processes × two virtual CPU devices each (global mesh of 4).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

# NOTE: JAX_PLATFORMS/JAX_NUM_CPU_DEVICES must be in the WORKER'S
# SPAWN env (sitecustomize imports jax before the script body runs, so
# in-script os.environ writes are too late to change the platform).
_WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["VECTORX_REPO"])
    import numpy as np
    import jax
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    from vectorx_tpu.parallel.scheduler import init_distributed

    pid = int(sys.argv[1])
    init_distributed(coordinator=os.environ["COORD"],
                     num_processes=2, process_id=pid)
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map
    from functools import partial

    assert jax.process_count() == 2, jax.process_count()
    devs = np.array(jax.devices())          # 4 global devices
    assert devs.size == 4, devs
    mesh = Mesh(devs, ("d",))

    # cross-process psum over the global mesh
    @partial(shard_map, mesh=mesh, in_specs=P("d"), out_specs=P())
    def total(x):
        return jax.lax.psum(jnp.sum(x), "d")[None]

    # each process supplies its LOCAL shard of the global array
    local = np.arange(2, dtype=np.float32) + 10 * pid
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), local, global_shape=(4,))
    out = total(garr)
    got = float(jax.device_get(out.addressable_data(0)))
    want = float(np.arange(2).sum() + (np.arange(2) + 10).sum())
    assert got == want, (got, want)

    # a GF(p) field op partitioned across processes (the prover's
    # sharded-domain pattern at DCN scale)
    from vectorx_tpu.field import goldilocks as gl
    vals = np.arange(4 * 8, dtype=np.uint64).reshape(4, 8)
    lo, hi = gl.from_u64(vals[2 * pid:2 * pid + 2])
    glo = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), np.asarray(lo), global_shape=(4, 8))
    ghi = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), np.asarray(hi), global_shape=(4, 8))
    sq = jax.jit(lambda a, b: gl.mul(a, b, a, b))(glo, ghi)
    loc = jax.device_get(sq[0].addressable_data(0))
    print("OK", got, loc.shape, flush=True)
""")


@pytest.mark.skipif(os.environ.get("VECTORX_TEST_TPU") == "1",
                    reason="CPU multi-process simulation only")
def test_two_process_cpu_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["COORD"] = f"127.0.0.1:{port}"
    env["VECTORX_REPO"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    # workers must not inherit this process's forced single-host flags;
    # platform selection must happen in the spawn env (see _WORKER note)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    env["PALLAS_AXON_POOL_IPS"] = ""
    procs = [subprocess.Popen([sys.executable, str(script), str(pid)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out.decode(errors="replace"))
    finally:
        for p in procs:
            p.kill()
    for rc, out in zip([p.returncode for p in procs], outs):
        assert rc == 0, out[-2000:]
        assert "OK" in out
