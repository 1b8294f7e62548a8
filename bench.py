#!/usr/bin/env python
"""Headline benchmark: env-steps/s/chip at 16k parallel envs (BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the reference implementation's single-env
CPU stepping rate, measured here directly (the reference publishes no numbers
— BASELINE.md), cached in BASELINE_MEASURED.json after the first run.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

B = int(os.environ.get("BENCH_ENVS", 16384))
T = int(os.environ.get("BENCH_STEPS", 256))
ITERS = int(os.environ.get("BENCH_ITERS", 5))
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BASELINE_MEASURED.json")


def measure_reference_steps_per_s(n_steps: int = 3000) -> float:
    """Single-env stepping rate of the reference implementation (CPU)."""
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            return json.load(f)["reference_single_env_steps_per_s"]
    import numpy as np

    from gym_craftingworld_tpu.parity import oracle

    if not oracle.reference_available():
        return float("nan")
    env = oracle.make_reference_env("ray", seed=0)
    env.reset()
    rng = np.random.RandomState(0)
    actions = rng.randint(6, size=n_steps)
    t0 = time.time()
    for a in actions:
        _, _, done, _ = env.step(int(a))
        if done:
            env.reset()
    rate = n_steps / (time.time() - t0)
    with open(_CACHE, "w") as f:
        json.dump({"reference_single_env_steps_per_s": rate,
                   "n_steps": n_steps}, f)
    return rate


def _enable_compilation_cache():
    """Persistent XLA compilation cache (works through the axon relay).

    The transposed fused Pallas kernel is the fastest engine but its cold
    Mosaic compile takes 15+ minutes via the remote relay; with the repo-local
    cache warmed once, subsequent runs load the executable in seconds.
    """
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    baseline = measure_reference_steps_per_s()

    _enable_compilation_cache()
    import jax

    from gym_craftingworld_tpu import ray_config, reset_from_seed, rollout_random

    # default: transposed scan — 133M steps/s and ~2 min cold compile.
    # BENCH_LAYOUT=fused_t selects the Pallas kernel (143M steps/s) but its
    # cold Mosaic compile via the remote relay can take 15+ minutes.
    layout = os.environ.get("BENCH_LAYOUT", "transposed")
    cfg = ray_config()
    state = reset_from_seed(cfg, 0, B)
    key = jax.random.PRNGKey(0)

    if layout == "fused_t":
        # fastest engine: transposed-layout fused Pallas kernel; the warmup
        # call below falls back to the scan path if the kernel fails to
        # compile on this backend
        import importlib
        from types import SimpleNamespace

        from gym_craftingworld_tpu.core import slots as sm

        frt = importlib.import_module(
            "gym_craftingworld_tpu.ops.fused_rollout_t"
        )
        state = sm.from_env_state(state)

        def roll(cfg, st, key, T):
            seed = int(jax.random.randint(key, (), 0, 2**31 - 1))
            st, rewards, dones = frt.fused_rollout_t(cfg, st, seed, T)
            return st, SimpleNamespace(reward=rewards)

        try:
            state, out = roll(cfg, state, key, T)  # compile + warm (or fail)
            int(out.reward.sum())
            warmed = True
        except Exception:
            layout = "transposed"
            warmed = False
    else:
        warmed = False

    if layout == "transposed":
        import importlib

        from gym_craftingworld_tpu.core import slots as sm

        tr = importlib.import_module(
            "gym_craftingworld_tpu.ops.transposed_rollout"
        )
        state = sm.from_env_state(reset_from_seed(cfg, 0, B))
        roll = tr.rollout_t_random
    elif layout == "slots":
        from gym_craftingworld_tpu.core import slots as sm

        state = sm.from_env_state(state)
        roll = sm.rollout_slots_random
    elif layout == "grid":
        roll = rollout_random

    if not warmed:
        state, out = roll(cfg, state, key, T)  # compile + warm
        int(out.reward.sum())  # host sync

    # median of per-iteration times, each synced by a checksum: robust to
    # relay jitter and async-timing artifacts (see CLAUDE.md)
    times = []
    for i in range(max(ITERS, 5)):
        key = jax.random.fold_in(key, i)
        t0 = time.time()
        state, out = roll(cfg, state, key, T)
        int(out.reward.sum())
        times.append(time.time() - t0)
    times.sort()
    steps_per_s = B * T / times[len(times) // 2]

    print(
        json.dumps(
            {
                "metric": f"env_steps_per_s_per_chip_{B//1024}k_envs",
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / baseline, 1)
                if baseline == baseline
                else None,
            }
        )
    )


if __name__ == "__main__":
    main()
