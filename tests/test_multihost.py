"""Multi-process distributed sampling without a cluster.

The reference tests MPI by launching ``mpirun -np N`` on localhost
(``runTests.py:115-128``); the analog here launches two
``jax.distributed`` processes (gloo CPU backend), each backing 4 virtual
devices of one 8-device global mesh, and runs the chain-sharded NUTS
driver across the process boundary.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
sys.path.insert(0, {root!r})
pid = int(sys.argv[1])
from math_tpu.parallel import initialize_multihost
initialize_multihost("127.0.0.1:{port}", 2, pid)
import numpy as np, jax.numpy as jnp
from math_tpu.parallel import chain_mesh, sample_nuts_sharded
from math_tpu.models import eight_schools
assert jax.device_count() == 8 and jax.local_device_count() == 4
model = eight_schools.make()
mesh = chain_mesh(8)
res = sample_nuts_sharded(model.logp, jax.random.PRNGKey(0), model.dim,
                          num_chains=8, num_warmup=50, num_samples=50,
                          max_depth=6, mesh=mesh, dtype=jnp.float64)
from jax.experimental import multihost_utils
pos = multihost_utils.process_allgather(res.position, tiled=True)
np.save({out!r} + str(pid) + ".npy", np.asarray(pos))
print("WORKER_OK", pid)
"""


@pytest.mark.slow
def test_two_process_sharded_nuts(tmp_path):
    out = str(tmp_path / "pos_")
    # grab an ephemeral port so concurrent runs don't collide on the
    # coordinator bind (a fixed port flakes under pytest-xdist)
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    code = WORKER.format(root=ROOT, port=port, out=out)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{o[-3000:]}"
        assert f"WORKER_OK {pid}" in o

    pos0 = np.load(out + "0.npy")
    pos1 = np.load(out + "1.npy")
    assert pos0.shape == (8, 50, 10)
    # both controllers must observe the identical global draw stream
    np.testing.assert_array_equal(pos0, pos1)
    # posterior sanity on the gathered draws (eight-schools mu ~ 4.4)
    mu = float(np.mean(pos0[:, :, 0]))
    assert 2.0 < mu < 7.0, mu
