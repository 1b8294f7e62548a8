"""True multi-process distributed test (2 processes × 4 virtual CPU devices).

Validates the multi-host path end-to-end with jax.distributed: global mesh
spanning processes, sharded resets where each process computes only its local
shard, and a rollout whose results match the single-process run bit-exactly
(mesh-layout independence, BASELINE config 5).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:59731",
    num_processes=2,
    process_id=proc_id,
    local_device_ids=list(range(4)),
)
import numpy as np
from gym_craftingworld_tpu import EnvConfig, rollout_random
from gym_craftingworld_tpu.parallel.mesh import make_env_mesh, reset_sharded

assert jax.device_count() == 8, jax.device_count()
assert jax.process_count() == 2

cfg = EnvConfig(height=6, width=6, max_steps=30)
mesh = make_env_mesh()
state = reset_sharded(cfg, seed=5, batch_size=32, mesh=mesh)
state, out = rollout_random(cfg, state, jax.random.PRNGKey(2), 25)

# gather per-step rewards to every host and print a checksum + digest
rewards = np.asarray(jax.device_get(out.reward.addressable_shards[0].data))
total = int(np.asarray(out.reward.sum()))  # triggers cross-host allreduce path
print(f"RESULT {proc_id} {total}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("CI") == "true", reason="spawns processes")
def test_two_process_mesh_rollout():
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    totals = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, out[-2000:]
        totals.append(int(lines[0].split()[2]))
    # both processes observe the same global reward checksum
    assert totals[0] == totals[1]

    # and it matches the single-process virtual-mesh run (layout independence)
    single = subprocess.run(
        [sys.executable, "-c", _SINGLE],
        capture_output=True,
        text=True,
        timeout=240,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert single.returncode == 0, single.stdout + single.stderr
    line = [l for l in single.stdout.splitlines() if l.startswith("RESULT")][0]
    assert int(line.split()[1]) == totals[0]


_SINGLE = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from gym_craftingworld_tpu import EnvConfig, rollout_random
from gym_craftingworld_tpu.parallel.mesh import make_env_mesh, reset_sharded
cfg = EnvConfig(height=6, width=6, max_steps=30)
mesh = make_env_mesh()
state = reset_sharded(cfg, seed=5, batch_size=32, mesh=mesh)
state, out = rollout_random(cfg, state, jax.random.PRNGKey(2), 25)
print("RESULT", int(np.asarray(out.reward.sum())), flush=True)
"""
