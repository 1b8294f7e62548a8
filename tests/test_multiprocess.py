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
    coordinator_address="localhost:" + sys.argv[2],
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


def _free_port() -> int:
    """Reserve an OS-assigned free port for the jax.distributed coordinator
    (a fixed port collides with concurrent test runs on the same machine)."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(os.environ.get("CI") == "true", reason="spawns processes")
def test_two_process_mesh_rollout():
    port = _free_port()
    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(i), str(port)],
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


_WORKER_ENGINES = r"""
import os, sys
from functools import partial
proc_id = int(sys.argv[1])
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address="localhost:" + sys.argv[2],
    num_processes=2,
    process_id=proc_id,
    local_device_ids=list(range(4)),
)
import numpy as np
import jax.numpy as jnp
from gym_craftingworld_tpu import EnvConfig, reset_from_seed
from gym_craftingworld_tpu.core import slots as sm
from gym_craftingworld_tpu.parallel import sharded_engine as se
from gym_craftingworld_tpu.parallel.mesh import env_sharding, make_env_mesh
from gym_craftingworld_tpu.train import fast_ppo as fp

assert jax.process_count() == 2 and jax.device_count() == 8

cfg = EnvConfig(height=7, width=7, max_steps=20)
mesh = make_env_mesh()

# ---- path 1: packed-scan rollout sharded across the 2-process mesh ----
B, T = 64, 40
slots = jax.jit(
    lambda: sm.from_env_state(reset_from_seed(cfg, 3, B)),
    out_shardings=env_sharding(mesh),
)()
actions = jnp.asarray(
    np.random.RandomState(11).randint(0, 6, size=(T, B)), jnp.int32
)
sl_out, out = se.rollout_p_sharded(cfg, slots, actions, T, mesh)
ck_reward = int(out.reward.sum())
ck_done = int(out.done.sum())
w = jnp.arange(B, dtype=jnp.int32)
ck_state = int((sl_out.agent[:, 0] * 7 + sl_out.agent[:, 1]) @ w) + int(
    sl_out.achieved.astype(jnp.int32).sum()
)
print(f"SCAN {proc_id} {ck_reward} {ck_done} {ck_state}", flush=True)

# ---- path 2: the fast (packed-engine) PPO train step across processes ----
fppo = fp.FastPPOConfig(rollout_steps=8, num_minibatches=2,
                        update_epochs=1, hidden=32)
B2 = 1024
env = jax.jit(
    lambda k: fp.fresh_packed_batch(cfg, k, B2),
    out_shardings=se.packed_lane_sharding(mesh),
)(jax.random.PRNGKey(4))
ts = fp.init_fast_train_state(jax.random.PRNGKey(5), cfg, fppo)
step = se.fast_train_step_sharded(cfg, fppo, mesh)
ts, env, _, metrics = step(ts, env, jax.random.PRNGKey(6))
assert len(env.slot_key.sharding.device_set) == 8
loss = float(metrics["loss"])
sps = float(metrics["success_per_step"])
print(f"FASTPPO {proc_id} {loss:.9e} {sps:.9e}", flush=True)
"""

_SINGLE_ENGINES = r"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from gym_craftingworld_tpu import EnvConfig, reset_from_seed
from gym_craftingworld_tpu.core import slots as sm
from gym_craftingworld_tpu.ops.packed_rollout import rollout_p
from gym_craftingworld_tpu.parallel import sharded_engine as se
from gym_craftingworld_tpu.parallel.mesh import make_env_mesh
from gym_craftingworld_tpu.train import fast_ppo as fp

cfg = EnvConfig(height=7, width=7, max_steps=20)
B, T = 64, 40
# UNSHARDED single-process reference for the scan path (bit-exactness of the
# multi-process run against plain single-device execution)
slots = sm.from_env_state(reset_from_seed(cfg, 3, B))
actions = jnp.asarray(
    np.random.RandomState(11).randint(0, 6, size=(T, B)), jnp.int32
)
sl_out, out = rollout_p(cfg, slots, actions, T)
w = jnp.arange(B, dtype=jnp.int32)
ck_state = int((sl_out.agent[:, 0] * 7 + sl_out.agent[:, 1]) @ w) + int(
    sl_out.achieved.astype(jnp.int32).sum()
)
print("SCAN", int(out.reward.sum()), int(out.done.sum()), ck_state,
      flush=True)

mesh = make_env_mesh()
fppo = fp.FastPPOConfig(rollout_steps=8, num_minibatches=2,
                        update_epochs=1, hidden=32)
B2 = 1024
env = jax.jit(
    lambda k: fp.fresh_packed_batch(cfg, k, B2),
    out_shardings=se.packed_lane_sharding(mesh),
)(jax.random.PRNGKey(4))
ts = fp.init_fast_train_state(jax.random.PRNGKey(5), cfg, fppo)
step = se.fast_train_step_sharded(cfg, fppo, mesh)
ts, env, _, metrics = step(ts, env, jax.random.PRNGKey(6))
print(f"FASTPPO {float(metrics['loss']):.9e} "
      f"{float(metrics['success_per_step']):.9e}", flush=True)
"""


@pytest.mark.skipif(os.environ.get("CI") == "true", reason="spawns processes")
def test_two_process_packed_scan_and_fast_ppo():
    """Two of the six dryrun sharded paths, end-to-end ACROSS PROCESS
    BOUNDARIES: the packed-scan rollout must match plain single-device
    execution bit-exactly, and the sharded fast-PPO train step must produce
    identical metrics on every process and match the single-process
    8-virtual-device mesh run."""
    port = _free_port()
    env = dict(os.environ)
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER_ENGINES, str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=cwd,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    def grab(out, tag):
        lines = [l for l in out.splitlines() if l.startswith(tag)]
        assert lines, out[-3000:]
        return lines[0].split()[2:]

    scan = [grab(o, "SCAN") for o in outs]
    ppo = [grab(o, "FASTPPO") for o in outs]
    assert scan[0] == scan[1]  # both processes agree on the global rollout
    assert ppo[0] == ppo[1]  # and on the training metrics

    single = subprocess.run(
        [sys.executable, "-c", _SINGLE_ENGINES],
        capture_output=True, text=True, timeout=300, env=env, cwd=cwd,
    )
    assert single.returncode == 0, single.stdout + single.stderr
    s_scan = [l for l in single.stdout.splitlines() if l.startswith("SCAN")][0]
    s_ppo = [l for l in single.stdout.splitlines()
             if l.startswith("FASTPPO")][0]
    # packed scan: bit-exact vs plain single-device execution
    assert s_scan.split()[1:] == scan[0], (s_scan, scan[0])
    # fast-PPO: float metrics within partitioning tolerance of the
    # single-process mesh run
    for a, b in zip(s_ppo.split()[1:], ppo[0]):
        assert abs(float(a) - float(b)) <= 1e-6 + 1e-5 * abs(float(a)), (
            s_ppo, ppo[0])
