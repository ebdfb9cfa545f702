"""Real multi-process jax.distributed smoke test (SURVEY.md section 4:
"multi-host" logic must be testable without a pod).  Two CPU processes
form a 2-device mesh over the distributed runtime and run the sharded
elite exchange; skipped cleanly if the environment forbids it."""

import socket
import subprocess
import sys
import textwrap

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 1)
    coordinator, n, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    jax.distributed.initialize(coordinator, n, rank)
    assert jax.device_count() == n, jax.devices()

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    import sys as _s
    _s.path.insert(0, ".")
    from lifeapi_tpu.parallel.mesh import Mesh
    import numpy as np

    mesh = Mesh(np.asarray(jax.devices()).reshape(n, 1), ("scenario", "candidate"))

    @lambda f: shard_map(f, mesh=mesh, in_specs=(P("scenario"),), out_specs=P(),
                         check_vma=False)
    def global_min(x):
        local = jnp.min(x)
        return jax.lax.pmin(local, "scenario")

    x = jnp.arange(8.0) + 100 * rank
    out = global_min(x)
    # the global minimum must be rank 0's smallest element on every process
    assert float(out) == 0.0, float(out)
    print(f"rank {rank} ok", flush=True)
    """
)


def test_two_process_distributed_pmin(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coordinator, "2", str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=90)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed runtime did not come up in time")
    for p, out in zip(procs, outs):
        if p.returncode != 0 and "initialize" in out:
            pytest.skip(f"jax.distributed unavailable here: {out[-300:]}")
        assert p.returncode == 0, out
        assert "ok" in out
