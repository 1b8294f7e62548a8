"""End-to-end proof of the fused PPO-update kernel: identical training curves.

VERDICT r3 item 5: per-minibatch gradient parity (cosine > 0.999) does not by
itself rule out compounding drift over thousands of updates. This tool trains
the SAME fast-PPO setting twice from identical seeds — once through the fused
Pallas gradient kernel, once through autodiff of `_loss_bm` — and records
both success curves. The learning benchmark is the one PPO actually solves
(single-task 8x8, the tests/test_fast_ppo.py setting scaled up), over enough
updates that compounding error would separate the curves.

Writes docs/fused_update_e2e.json: both curves per seed, tail means, and the
cross-path gap vs the cross-seed spread (the noise floor). The companion test
(tests/test_fused_update.py::test_fused_kernel_end_to_end_curve) runs a small
interpret-mode version of the same comparison in CI.

    python tools/fused_update_e2e.py          # TPU
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

from functools import partial  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from gym_craftingworld_tpu import flat_config  # noqa: E402
from gym_craftingworld_tpu.train import fast_ppo as fp  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "fused_update_e2e.json")

B = int(os.environ.get("E2E_ENVS", 4096))
UPDATES = int(os.environ.get("E2E_UPDATES", 384))
SEEDS = (0, 1)
TAIL = 64


@partial(jax.jit, static_argnums=(0, 1, 2, 3))
def _train(cfg, fppo, n, use_fused, seed):
    ts = fp.init_fast_train_state(jax.random.PRNGKey(100 + seed), cfg, fppo)
    env = fp.fresh_packed_batch(cfg, jax.random.PRNGKey(200 + seed), B)

    def body(carry, _):
        ts, env, key = carry
        key, k_pool, k_roll, k_perm = jax.random.split(key, 4)
        pool = fp.fresh_packed_batch(cfg, k_pool, 2 * B)
        env, traj = fp._collect(cfg, fppo, ts.params, env, pool, k_roll)
        _, last_value = fp.apply_policy(ts.params, fp.features(cfg, env))
        adv, ret = fp._gae(fppo, traj, last_value)
        params, opt_state, losses, _ = fp._update_phase(
            fppo, ts, traj, adv, ret, k_perm, use_fused_kernel=use_fused)
        ts = fp.FastTrainState(params, opt_state, ts.update_idx + 1)
        sps = (traj.raw_reward == cfg.max_steps).sum() / traj.action.size
        return (ts, env, key), sps

    (ts, env, _), curve = jax.lax.scan(
        body, (ts, env, jax.random.PRNGKey(300 + seed)), None, length=n)
    return curve


def main():
    cfg = dataclasses.replace(flat_config(), stacking=False)
    fppo = fp.FastPPOConfig()
    results = {"config": {"envs": B, "updates": UPDATES,
                          "grid": "8x8 single-task", "seeds": list(SEEDS),
                          "tail": TAIL}}
    curves = {}
    for use_fused in (True, False):
        name = "fused_kernel" if use_fused else "autodiff"
        curves[name] = {}
        for seed in SEEDS:
            t0 = time.time()
            c = np.asarray(_train(cfg, fppo, UPDATES, use_fused, seed))
            curves[name][f"seed{seed}"] = [float(x) for x in c]
            print(f"{name} seed{seed}: tail success/step "
                  f"{float(c[-TAIL:].mean()):.5f} ({time.time()-t0:.0f}s)",
                  flush=True)
    results["curves_success_per_step"] = curves
    tails = {
        name: {s: float(np.mean(v[-TAIL:])) for s, v in by.items()}
        for name, by in curves.items()
    }
    results["tail_mean"] = tails
    # noise floor: cross-seed spread within each path
    noise = max(
        abs(tails["fused_kernel"]["seed0"] - tails["fused_kernel"]["seed1"]),
        abs(tails["autodiff"]["seed0"] - tails["autodiff"]["seed1"]),
    )
    gap = max(
        abs(tails["fused_kernel"][s] - tails["autodiff"][s])
        for s in ("seed0", "seed1")
    )
    results["cross_seed_noise"] = noise
    results["cross_path_gap"] = gap
    results["within_noise"] = bool(gap <= max(2 * noise, 0.1 * max(
        v for by in tails.values() for v in by.values())))
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2, sort_keys=True)
    print(f"gap {gap:.5f} vs noise {noise:.5f} "
          f"(within_noise={results['within_noise']}) → {OUT}")


if __name__ == "__main__":
    main()
