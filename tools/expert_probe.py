"""Find and diagnose expert failures across many seeds."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.agents.expert import ExpertPolicy
from gym_craftingworld_tpu.api import CraftingWorldEnvFlat, CraftingWorldEnvRay

fails = []

mode = sys.argv[1] if len(sys.argv) > 1 else "all"

if mode in ("all", "single"):
    for task in C.TASK_LIST:
        for seed in range(10):
            env = CraftingWorldEnvRay(seed=seed * 13 + 7,
                                      selected_tasks=[task],
                                      stacking=False, max_steps=300)
            env.reset()
            r = ExpertPolicy(env).run_episode()
            if r != env.MAX_STEPS:
                d = np.asarray(env.desired_goal_vector).reshape(-1)
                a = np.asarray(env.achieved_goal_vector).reshape(-1)
                fails.append(("single", task, seed * 13 + 7, d.tolist(), a.tolist()))
                print("FAIL single", task, "seed", seed * 13 + 7,
                      "desired", np.flatnonzero(d), "achieved", np.flatnonzero(a))

if mode in ("all", "stacked"):
    for seed in range(50):
        env = CraftingWorldEnvRay(seed=seed, stacking=True, max_steps=300)
        env.reset()
        r = ExpertPolicy(env).run_episode()
        if r != env.MAX_STEPS:
            d = np.asarray(env.desired_goal_vector).reshape(-1)
            a = np.asarray(env.achieved_goal_vector).reshape(-1)
            fails.append(("stacked", "", seed, d.tolist(), a.tolist()))
            print("FAIL stacked seed", seed,
                  "desired", [C.TASK_LIST[i] for i in np.flatnonzero(d)],
                  "achieved", [C.TASK_LIST[i] for i in np.flatnonzero(a)])

if mode in ("all", "flat"):
    for seed in range(20):
        env = CraftingWorldEnvFlat(seed=seed, stacking=True)
        env.reset()
        r = ExpertPolicy(env).run_episode()
        if r != env.MAX_STEPS:
            d = np.asarray(env.desired_goal_vector).reshape(-1)
            a = np.asarray(env.achieved_goal_vector).reshape(-1)
            fails.append(("flat", "", seed, d.tolist(), a.tolist()))
            print("FAIL flat seed", seed,
                  "desired", [C.TASK_LIST[i] for i in np.flatnonzero(d)],
                  "achieved", [C.TASK_LIST[i] for i in np.flatnonzero(a)])

print(f"total failures: {len(fails)}")
