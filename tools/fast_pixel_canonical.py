"""Pixel-policy PPO at canonical scale: 21x21 grid, 16k envs (VERDICT r3 #9).

Trains train/fast_pixel_ppo's conv policy — which consumes the re-rendered
(B, 21, 21, 12) one-hot observation every step — on the canonical grid at the
headline batch, and records:

  * the full-loop training rate at canonical shapes (absolute-timed, 64
    updates per dispatch);
  * a learning curve on the single-task canonical setting (stacking=False;
    flat PPO on stacked exact-match goals fails by design — the CPV paper's
    motivating observation, see docs/training.md — so single-task is the
    meaningful from-scratch demonstration at this scale);
  * the stacked setting's success-per-step over the same budget, recorded
    honestly for completeness.

Writes docs/pixel_canonical.json.

    python tools/fast_pixel_canonical.py
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gym_craftingworld_tpu import ray_config  # noqa: E402
from gym_craftingworld_tpu.train import fast_pixel_ppo as fpx  # noqa: E402
from gym_craftingworld_tpu.train.fast_ppo import fresh_packed_batch  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "pixel_canonical.json")

B = int(os.environ.get("PIXC_ENVS", 16384))
UPDATES = int(os.environ.get("PIXC_UPDATES", 600))
CHUNK = 50


def run_curve(cfg, ppo, seed, updates):
    ts = fpx.init_pixel_train_state(jax.random.PRNGKey(100 + seed), cfg, ppo)
    env = fresh_packed_batch(cfg, jax.random.PRNGKey(200 + seed), B)
    key = jax.random.PRNGKey(300 + seed)
    curve = []
    t0 = time.time()
    done = 0
    while done < updates:
        n = min(CHUNK, updates - done)
        ts, env, key, m = fpx.train_many_pixel(cfg, ppo, ts, env, n, key)
        curve.extend(float(x) for x in np.asarray(m["success_per_step"]))
        done += n
        print(f"  {done}/{updates}: success/step "
              f"{np.mean(curve[-CHUNK:]):.5f} ({time.time()-t0:.0f}s)",
              flush=True)
    return curve


def loop_rate(cfg, ppo):
    ts0 = fpx.init_pixel_train_state(jax.random.PRNGKey(0), cfg, ppo)
    env0 = fresh_packed_batch(cfg, jax.random.PRNGKey(1), B)

    def run(n):
        ts = jax.tree.map(lambda x: x.copy(), ts0)
        ts, env, k, m = fpx.train_many_pixel(cfg, ppo, ts, env0, n,
                                             jax.random.PRNGKey(7))
        return float(m["loss"][-1])

    N = 32
    run(N)
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        run(N)
        best = min(best, time.time() - t0)
    return B * ppo.rollout_steps * N / best, best / N * 1e3


def main():
    default = fpx.PixelPPOConfig()
    preset = fpx.PixelPPOConfig.throughput()
    cfg_single = dataclasses.replace(ray_config(), stacking=False)
    cfg_stacked = ray_config()

    rate_d, ms_d = loop_rate(cfg_stacked, default)
    print(f"default full loop: {rate_d:.3e} env-steps/s ({ms_d:.1f} "
          f"ms/update)", flush=True)
    rate_p, ms_p = loop_rate(cfg_stacked, preset)
    print(f"preset  full loop: {rate_p:.3e} env-steps/s ({ms_p:.1f} "
          f"ms/update)", flush=True)

    # matched WALL-CLOCK single-task curves: the preset gets however many
    # updates fit in the default's budget
    updates_p = int(round(UPDATES * ms_d / ms_p))
    print(f"single-task canonical curve (default, {UPDATES} updates):",
          flush=True)
    curve_d = run_curve(cfg_single, default, 0, UPDATES)
    print(f"single-task canonical curve (preset, {updates_p} updates = "
          f"same wall-clock):", flush=True)
    curve_p = run_curve(cfg_single, preset, 0, updates_p)

    try:
        with open(OUT) as f:
            doc = json.load(f)
    except (OSError, json.JSONDecodeError):
        doc = {}
    doc["config"] = {"envs": B, "grid": "21x21", "updates": UPDATES,
                     "policy": "conv stem over the re-rendered (21,21,12) "
                               "one-hot observation"}
    doc["default"] = {
        "policy": f"c{default.conv1}/c{default.conv2}/h{default.hidden}, "
                  f"{default.update_epochs} ep x {default.num_minibatches} mb",
        "full_loop_env_steps_per_s": rate_d,
        "ms_per_update": ms_d,
        "single_task_tail_mean": float(np.mean(curve_d[-50:])),
        "single_task_curve": curve_d,
    }
    doc["throughput_preset"] = {
        "policy": f"c{preset.conv1}/c{preset.conv2}/h{preset.hidden}, "
                  f"{preset.update_epochs} ep x {preset.num_minibatches} mb",
        "full_loop_env_steps_per_s": rate_p,
        "ms_per_update": ms_p,
        "updates_at_matched_wall_clock": updates_p,
        "single_task_tail_mean": float(np.mean(curve_p[-50:])),
        "single_task_curve": curve_p,
    }
    doc.pop("full_loop_env_steps_per_s", None)
    doc.pop("ms_per_update", None)
    doc.pop("single_task", None)
    doc.setdefault("stacked", {}).setdefault("note", (
        "flat PPO on stacked exact-match goals fails by design — the "
        "compositional-plan-vector paper's motivating observation; the "
        "solved-canonical pixel result is the distilled_student section"))
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
