"""Measure fast-PPO full-loop throughput on the real chip.

Uses train_many_fast (N updates in ONE dispatch) and delta-times N vs N/2
so the ~30-40ms relay constant cancels (CLAUDE.md timing rules).

  python tools/fast_ppo_bench.py [ENVS] [N_UPDATES]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
N = int(sys.argv[2]) if len(sys.argv) > 2 else 16

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

from gym_craftingworld_tpu import ray_config  # noqa: E402
from gym_craftingworld_tpu.train import fast_ppo as fp  # noqa: E402

cfg = ray_config()
fppo = fp.FastPPOConfig()
key = jax.random.PRNGKey(0)
ts = fp.init_fast_train_state(key, cfg, fppo)
env = fp.fresh_packed_batch(cfg, jax.random.fold_in(key, 1), B)


def run(ts, env, key, n):
    t0 = time.time()
    ts, env, key, metrics = fp.train_many_fast(cfg, fppo, ts, env, n, key)
    float(metrics["loss"][-1])  # host sync
    return time.time() - t0, ts, env, key


# compile + warm both lengths
_, ts, env, key = run(ts, env, key, N)
_, ts, env, key = run(ts, env, key, N // 2)

steps_per_update = B * fppo.rollout_steps
full, half = [], []
for i in range(5):
    t, ts, env, key = run(ts, env, key, N)
    full.append(t)
    t, ts, env, key = run(ts, env, key, N // 2)
    half.append(t)
full.sort(); half.sort()
dt = full[len(full) // 2] - half[len(half) // 2]
rate = steps_per_update * (N - N // 2) / dt
print(f"envs={B} rollout_steps={fppo.rollout_steps} "
      f"updates={N} vs {N//2}")
print(f"median full={full[len(full)//2]:.3f}s half={half[len(half)//2]:.3f}s "
      f"delta={dt:.3f}s")
print(f"ms/update={1000*dt/(N - N//2):.1f}")
print(f"full-loop env-steps/s = {rate:.3e}")
