"""Diagnose CPV compositional-matrix failures: trace failing pair episodes.

Trains the same model/protocol as tools/cpv_matrix.py (optionally smaller),
saves params, then replays chosen pairs step-by-step and classifies failures:

  * wrong_latch   — an undesired latching bit got set (unrecoverable)
  * stall         — the same (state, action) loop repeated until timeout
  * timeout       — ran out of steps while still making distinct states

    JAX_PLATFORMS=cpu python tools/cpv_debug.py --pairs BuildHouse+MoveSticks
"""

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from gym_craftingworld_tpu import constants as C  # noqa: E402

import tools.cpv_matrix as cm  # noqa: E402

_LATCH = [C.T_MAKE_BREAD, C.T_EAT_BREAD, C.T_BUILD_HOUSE, C.T_CHOP_TREE,
          C.T_CHOP_ROCK]


def train(args):
    from gym_craftingworld_tpu.models.cpv import init_cpv
    from gym_craftingworld_tpu.train import bc

    base = dict(size=(8, 8), max_steps=60, stacking=False,
                fixed_init_state=args.pool)
    names = list(C.TASK_LIST)
    grid_dim = 8 * 8 * C.N_CHANNELS
    singles, single_tasks = [], []
    for k, task in enumerate(names):
        from gym_craftingworld_tpu.models.actor_critic import (
            obs_features_init,
        )

        d = bc.collect_demos(args.episodes_per_task, seed=args.seed,
                             selected_tasks=[task], random_warmup=25,
                             feature_fn=obs_features_init, **base)
        singles.append(d)
        single_tasks.append(np.full(len(d.actions), k, np.int32))
    demos_s = bc.concat_demos(*singles)
    tasks_s = np.concatenate(single_tasks)
    demos_c, tasks_c = cm.collect_context_demos(
        args.episodes_per_task * C.N_TASKS, args.seed, args.pool, cm._RANK)
    demos_base = bc.concat_demos(demos_s, demos_c)
    tasks_base = np.concatenate([tasks_s, tasks_c])
    demos_p = cm.augment_pending(demos_base, tasks_base, cm._RANK,
                                 args.seed + 99, grid_dim)
    demos_aug = bc.concat_demos(demos_base, demos_p)
    print(f"dataset rows: {len(demos_aug.actions)}")
    model, params = init_cpv(jax.random.PRNGKey(args.seed + 1), 8, 8,
                             hidden=256, with_init=True)
    params = cm.scan_bc_train(demos_aug, jax.random.PRNGKey(args.seed + 2),
                              model, params, epochs=args.epochs, batch=512,
                              lr=2e-3)
    return model, params


def trace_pair(model, params, pair, args, episodes=8, verbose=2):
    from gym_craftingworld_tpu.api.gym_env import CraftingWorldEnvRay
    from gym_craftingworld_tpu.models.actor_critic import (
        obs_features_init as obs_features,
    )

    names = list(C.TASK_LIST)
    idx = [names.index(p) for p in pair]
    env = CraftingWorldEnvRay(seed=args.seed, size=(8, 8), max_steps=60,
                              stacking=True, fixed_init_state=args.pool,
                              selected_tasks=list(pair))
    env.seed(args.seed + 8001)
    apply = jax.jit(lambda p, f: model.apply(p, f)[0])
    outcomes = {"success": 0, "wrong_latch": 0, "stall": 0, "timeout": 0}
    tries = 0
    while tries < episodes:
        env.reset()
        if int(np.asarray(env.desired_goal_vector).sum()) != 2:
            continue
        tries += 1
        seen = {}
        reward = -1
        hist = []
        for t in range(env.MAX_STEPS):
            a = int(jnp.argmax(apply(params, obs_features(env.state))[0]))
            des = np.flatnonzero(np.asarray(env.desired_goal_vector))
            ach = np.flatnonzero(np.asarray(env.achieved_goal_vector))
            hold = int(np.asarray(env._state.holding[0]))
            pos = tuple(np.asarray(env._state.agent[0]).tolist())
            hist.append((t, a, pos, hold, tuple(ach)))
            _, reward, done, _ = env.step(a)
            if done:
                break
        ach = np.asarray(env.achieved_goal_vector).reshape(-1)
        des = np.asarray(env.desired_goal_vector).reshape(-1)
        if reward == env.MAX_STEPS:
            outcomes["success"] += 1
            continue
        bad_latch = any(ach[b] and not des[b] for b in _LATCH)
        # stall: last 12 (pos, hold, ach, action) tuples cycle with period <=4
        tail = [h[1:] for h in hist[-12:]]
        stalled = len(set(map(str, tail))) <= 4
        kind = ("wrong_latch" if bad_latch else
                "stall" if stalled else "timeout")
        outcomes[kind] += 1
        if verbose:
            print(f"  FAIL[{kind}] ep{tries} desired={[names[i] for i in np.flatnonzero(des)]} "
                  f"achieved={[names[i] for i in np.flatnonzero(ach)]}")
            if verbose > 1:
                for h in hist[-18:]:
                    print("   ", h)
    return outcomes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes-per-task", type=int, default=150)
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--params", default="/tmp/cpv_params.pkl")
    ap.add_argument("--retrain", action="store_true")
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--verbose", type=int, default=2)
    ap.add_argument("--pairs", nargs="*", default=[
        "BuildHouse+MoveSticks", "GoToHouse+MoveAxe", "MoveAxe+MoveHammer",
        "MoveHammer+MoveSticks", "ChopTree+GoToHouse"])
    args = ap.parse_args()

    from gym_craftingworld_tpu.models.cpv import init_cpv

    model, params0 = init_cpv(jax.random.PRNGKey(args.seed + 1), 8, 8,
                              hidden=256, with_init=True)
    if os.path.exists(args.params) and not args.retrain:
        with open(args.params, "rb") as f:
            params = pickle.load(f)
        print(f"loaded {args.params}")
    else:
        t0 = time.time()
        model, params = train(args)
        with open(args.params, "wb") as f:
            pickle.dump(jax.device_get(params), f)
        print(f"trained in {time.time() - t0:.0f}s → {args.params}")

    for spec in args.pairs:
        pair = tuple(spec.split("+"))
        out = trace_pair(model, params, pair, args, episodes=args.episodes,
                         verbose=args.verbose)
        print(f"{spec}: {json.dumps(out)}")


if __name__ == "__main__":
    main()
