"""Scratch: delta-timed comparison of packed scan vs packed fused on TPU."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gym_craftingworld_tpu import ray_config, reset_from_seed
from gym_craftingworld_tpu.core import slots as sm
from gym_craftingworld_tpu.ops import packed_fused as pf
from gym_craftingworld_tpu.ops import packed_rollout as pr

B = int(os.environ.get("B", 16384))
T = int(os.environ.get("T", 16384))
ITERS = int(os.environ.get("ITERS", 7))
ENGINES = os.environ.get("ENGINES", "packed,fused").split(",")

cfg = ray_config()
state = reset_from_seed(cfg, 0, B)
sl = sm.from_env_state(state)
print(f"devices: {jax.devices()}", flush=True)


def timed(roll, st, n):
    times = []
    for i in range(ITERS):
        t0 = time.time()
        st, checksum = roll(st, i, n)
        int(checksum)
        times.append(time.time() - t0)
    times.sort()
    return times[len(times) // 2], st


def run(name, roll):
    st = sl
    t0 = time.time()
    st, c = roll(st, 0, T)
    int(c)
    print(f"{name}: warm T={T} in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    st, c = roll(st, 0, T // 2)
    int(c)
    print(f"{name}: warm T/2 in {time.time()-t0:.1f}s", flush=True)
    med_full, st = timed(roll, st, T)
    med_half, st = timed(roll, st, T // 2)
    dt = med_full - med_half
    rate = B * (T - T // 2) / dt if dt > 0 else float("nan")
    print(json.dumps({"engine": name, "med_full_s": round(med_full, 4),
                      "med_half_s": round(med_half, 4),
                      "steps_per_s": round(rate)}), flush=True)


if "packed" in ENGINES:
    run("packed_scan",
        lambda st, i, n: pr.rollout_p_bench(cfg, st, jax.random.PRNGKey(i), n))
if "fused" in ENGINES:
    run("packed_fused",
        lambda st, i, n: pf.fused_rollout_packed_bench(cfg, st, i, n))
