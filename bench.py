#!/usr/bin/env python
"""Headline benchmark: env-steps/s/chip at 16k parallel envs (BASELINE.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` compares against the reference implementation's single-env
CPU stepping rate, measured here directly (the reference publishes no numbers
— BASELINE.md), cached in BASELINE_MEASURED.json after the first run.

Timing method: every dispatch through the axon relay carries a fixed ~30-40 ms
round-trip cost that is a property of the relay, not of the chip. To report
pure device throughput the harness times rollouts of T and T/2 steps (each
synced per iteration with a reward checksum, medians of >=7 runs) and divides
the extra T/2 steps by the extra wall time — the per-call relay constant
cancels. Set BENCH_TIMING=absolute for raw wall-clock rates including the
relay round trip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

B = int(os.environ.get("BENCH_ENVS", 16384))
_LAYOUT = os.environ.get("BENCH_LAYOUT", "packed_fused")
# T=524288 puts ~0.5s of device time per run against the ~30-40ms relay
# constant, so the T-vs-T/2 delta (~0.25s) is ~50x the relay's few-ms jitter
# — per-run throughput estimates then spread <5% without dropping anything
# (step_num saturates at max_steps, so arbitrarily long no-reset rollouts are
# safe; fori_loop trip count doesn't change compile time or VMEM).
# Obs-interleaved rollouts (BENCH_LAYOUT=obs_*) render a full observation
# batch per step (~1ms each at 16k), so T=2048 already gives ~2s of device
# time per run.
T = int(os.environ.get("BENCH_STEPS",
                       2048 if _LAYOUT.startswith("obs_") else 1048576))
ITERS = int(os.environ.get("BENCH_ITERS", 11))
TIMING = os.environ.get("BENCH_TIMING", "delta")
# A paired sample deviating by more than STALL_FACTOR x from the running
# median is a relay stall artifact (the tunnel randomly delays dispatches by
# hundreds of ms under load; device time itself is deterministic — quiet-host
# samples agree within ~4%) — it is re-run, never silently dropped, and the
# retry count is reported as "stall_retries".
STALL_FACTOR = float(os.environ.get("BENCH_STALL_FACTOR", 1.15))
MAX_RETRIES = int(os.environ.get("BENCH_STALL_RETRIES", 14))
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
    """Persistent XLA compilation cache (works through the axon relay)."""
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _make_engine(layout, cfg, state):
    """Returns (roll(state, key, T) -> (state, checksum_int_array), state)."""
    import jax

    from gym_craftingworld_tpu.core import slots as sm

    if layout == "packed_fused":
        import jax.numpy as jnp

        from gym_craftingworld_tpu.ops import packed_fused as pfu

        state = sm.from_env_state(state)

        def roll(st, key, n):
            seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)
            return pfu.fused_rollout_packed_bench(cfg, st, seed, n)

        return roll, state
    if layout.startswith("obs_"):  # obs_ray | obs_altobs | obs_onehot
        from gym_craftingworld_tpu.ops import obs_rollout as obr

        obs_mode = layout[4:]
        state = sm.from_env_state(state)
        return (lambda st, key, n: obr.rollout_obs_random(
            cfg, st, key, n, obs_mode)), state
    if layout == "packed":
        from gym_craftingworld_tpu.ops import packed_rollout as pr

        state = sm.from_env_state(state)
        return (lambda st, key, n: pr.rollout_p_bench(cfg, st, key, n)), state
    if layout == "transposed":
        from gym_craftingworld_tpu.ops import transposed_rollout as tr

        state = sm.from_env_state(state)

        def roll(st, key, n):
            st, out = tr.rollout_t_random(cfg, st, key, n)
            return st, out.reward.sum()

        return roll, state
    if layout == "slots":
        state = sm.from_env_state(state)

        def roll(st, key, n):
            st, out = sm.rollout_slots_random(cfg, st, key, n)
            return st, out.reward.sum()

        return roll, state
    if layout == "grid":
        from gym_craftingworld_tpu import rollout_random

        def roll(st, key, n):
            st, out = rollout_random(cfg, st, key, n)
            return st, out.reward.sum()

        return roll, state
    raise SystemExit(f"unknown BENCH_LAYOUT {layout!r}")


def _median_time(roll, state, key, n, iters, retries):
    """Median + accepted run times; relay stalls are retried, not dropped.

    A stall = a run exceeding STALL_FACTOR x the median of the runs accepted
    so far (only judged once >=3 runs are in). ``retries`` is a shared
    mutable [count] so both the full-T and half-T phases draw one budget.
    Returns (median, accepted_times, state).
    """
    import jax

    def one(i):
        nonlocal state
        t0 = time.time()
        state, checksum = roll(state, jax.random.fold_in(key, i), n)
        int(checksum)  # host sync through the relay
        return time.time() - t0

    times = []
    i = 0
    while len(times) < iters:
        dt = one(i)
        i += 1
        if len(times) >= 3:
            med = sorted(times)[len(times) // 2]
            if dt > STALL_FACTOR * med and retries[0] < MAX_RETRIES:
                retries[0] += 1
                continue  # relay stall: re-run this slot
        times.append(dt)
    # post-hoc pass: a stall in the first 3 runs predates the detector —
    # re-run any accepted time above the final-median threshold
    changed = True
    while changed and retries[0] < MAX_RETRIES:
        changed = False
        med = sorted(times)[len(times) // 2]
        for j, t in enumerate(times):
            if t > STALL_FACTOR * med and retries[0] < MAX_RETRIES:
                retries[0] += 1
                times[j] = one(i)
                i += 1
                changed = True
    times.sort()
    return times[len(times) // 2], times, state


def _measure_delta(roll, state, key, retries):
    """One measurement take: paired (T, T/2) deltas, median-of-GROUP
    estimates. Returns (value, spread_dict, state).

    Each raw sample is (t_full - t_half) from two back-to-back runs, so slow
    relay/device periods hit both sides of its own pair and cancel — unlike
    medians taken minutes apart. A pair whose sample deviates by more than
    STALL_FACTOR from the running median is a relay stall and is re-run
    (counted, never dropped). Each reported ESTIMATE is the median of GROUP
    consecutive pair samples (a median absorbs single dispatch hiccups
    without discarding data); value/min/max/spread are over the estimates.
    """
    import jax as _jax

    GROUP = 3
    st = [state]

    def one(i, n):
        t0 = time.time()
        st[0], checksum = roll(st[0], _jax.random.fold_in(key, i), n)
        int(checksum)  # host sync through the relay
        return time.time() - t0

    samples = []
    i = 0
    patho = 0  # pathological pairs draw a bounded budget: a sustained relay
    # storm could otherwise make `tf <= th` persist and this loop spin forever
    want = max(ITERS, 5) * GROUP
    while len(samples) < want:
        tf = one(i, T)
        th = one(i + 1, T // 2)
        i += 2
        if tf <= th:
            patho += 1
            if patho > MAX_RETRIES:
                return None, {"pathological_pairs": patho}, st[0]
            continue  # pathological pair (relay hiccup mid-pair)
        est = B * (T - T // 2) / (tf - th)
        if len(samples) >= 3:
            med = sorted(samples)[len(samples) // 2]
            off = est < med / STALL_FACTOR or est > med * STALL_FACTOR
            if off and retries[0] < MAX_RETRIES:
                retries[0] += 1
                continue
        samples.append(est)
    # post-hoc: an early-slot stall predates the detector — re-run it
    changed = True
    while changed and retries[0] < MAX_RETRIES:
        changed = False
        med = sorted(samples)[len(samples) // 2]
        for j, e in enumerate(samples):
            off = e < med / STALL_FACTOR or e > med * STALL_FACTOR
            if off and retries[0] < MAX_RETRIES:
                retries[0] += 1
                tf = one(i, T)
                th = one(i + 1, T // 2)
                i += 2
                if tf > th:
                    samples[j] = B * (T - T // 2) / (tf - th)
                    changed = True
    ests = sorted(
        sorted(samples[g:g + GROUP])[GROUP // 2]
        for g in range(0, len(samples), GROUP)
    )
    steps_per_s = ests[len(ests) // 2]
    spread = {
        "runs": len(ests),
        "pairs": len(samples),
        "min": round(ests[0]),
        "max": round(ests[-1]),
        "spread_pct": round(100 * (ests[-1] - ests[0]) / steps_per_s, 1),
        "outliers_dropped": 0,
        "stall_retries": retries[0],
    }
    return steps_per_s, spread, st[0]


def main():
    try:  # shield dispatch latency from background host load where permitted
        os.nice(-10)
    except (OSError, PermissionError):
        pass
    baseline = measure_reference_steps_per_s()

    _enable_compilation_cache()
    import jax

    from gym_craftingworld_tpu import ray_config, reset_from_seed

    layout = _LAYOUT
    cfg = ray_config()
    state = reset_from_seed(cfg, 0, B)
    key = jax.random.PRNGKey(0)

    roll, state = _make_engine(layout, cfg, state)

    # compile + warm both rollout lengths
    state, checksum = roll(state, key, T)
    int(checksum)
    if TIMING == "delta":
        state, checksum = roll(state, key, T // 2)
        int(checksum)

    if TIMING == "delta":
        # Storm handling: when the relay tunnel is in a degraded phase
        # (random multi-hundred-ms dispatch delays for minutes at a time) no
        # estimator sees clean device numbers — quiet-phase samples agree
        # within ~4%. If the estimates still disagree badly after stall
        # retries, the whole take is re-measured after a cool-down; the JSON
        # reports how many takes were needed.
        takes = 0
        while True:
            takes += 1
            retries = [0]
            steps_per_s, spread, state = _measure_delta(
                roll, state, jax.random.fold_in(key, 1000 + takes), retries)
            if steps_per_s is None:
                break  # pathological-pair budget exhausted: storm too deep
            if spread["spread_pct"] <= 8.0 or takes >= 4:
                break
            time.sleep(30)  # wait out the storm, then take a fresh measure
        if steps_per_s is None:
            # delta pairing is unusable (sustained storm) — fall back to
            # absolute medians so the harness still reports a number; the
            # relay round trip is then included, biasing the value LOW
            retries = [0]
            med_full, times_full, state = _median_time(
                roll, state, jax.random.fold_in(key, 5000), T,
                max(ITERS, 5), retries)
            steps_per_s = B * T / med_full
            ests = sorted(B * T / t for t in times_full)
            spread = {
                "runs": len(times_full),
                "min": round(ests[0]),
                "max": round(ests[-1]),
                "spread_pct": round(
                    100 * (ests[-1] - ests[0]) / steps_per_s, 1),
                "outliers_dropped": 0,
                "stall_retries": retries[0],
                "timing_fallback": "absolute",
            }
        spread["measurement_takes"] = takes
    else:
        retries = [0]
        med_full, times_full, state = _median_time(roll, state, key, T,
                                                   max(ITERS, 5), retries)
        steps_per_s = B * T / med_full
        ests = sorted(B * T / t for t in times_full)
        spread = {
            "runs": len(times_full),
            "min": round(ests[0]),
            "max": round(ests[-1]),
            "spread_pct": round(100 * (ests[-1] - ests[0]) / steps_per_s, 1),
            "outliers_dropped": 0,
            "stall_retries": retries[0],
        }

    print(
        json.dumps(
            {
                "metric": (
                    f"env_steps_with_{layout[4:]}_obs_per_s_per_chip_"
                    f"{B//1024}k_envs"
                    if layout.startswith("obs_")
                    else f"env_steps_per_s_per_chip_{B//1024}k_envs"
                ),
                "value": round(steps_per_s),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / baseline, 1)
                if baseline == baseline
                else None,
                **spread,
            }
        )
    )


if __name__ == "__main__":
    main()
