"""Scripted expert: 100% success — every sampled goal set must be solved.

The expert is the framework's solvability proof, so no slack: any failure on
any seed is a planner bug (wider sweeps in tools/expert_probe.py)."""

import numpy as np
import pytest

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.agents.expert import ExpertPolicy
from gym_craftingworld_tpu.api import CraftingWorldEnvRay


@pytest.mark.parametrize("task", list(C.TASK_LIST))
def test_expert_completes_single_task(task):
    successes = 0
    trials = 25
    for seed in range(trials):
        env = CraftingWorldEnvRay(
            seed=seed * 13 + 7,
            selected_tasks=[task],
            stacking=False,
            max_steps=300,
        )
        env.reset()
        expert = ExpertPolicy(env)
        reward = expert.run_episode()
        if reward == env.MAX_STEPS:
            successes += 1
    assert successes == trials, f"{task}: {successes}/{trials} episodes solved"


def test_expert_completes_stacked_multi_task():
    wins = 0
    trials = 50
    for seed in range(trials):
        env = CraftingWorldEnvRay(seed=seed, stacking=True, max_steps=300)
        env.reset()
        reward = ExpertPolicy(env).run_episode()
        wins += reward == env.MAX_STEPS
    assert wins == trials, f"stacked goals: {wins}/{trials} solved"


def test_expert_flat_variant():
    from gym_craftingworld_tpu.api import CraftingWorldEnvFlat

    wins = 0
    for seed in range(8):
        env = CraftingWorldEnvFlat(seed=seed, stacking=True)
        env.reset()
        reward = ExpertPolicy(env).run_episode()
        wins += reward == env.MAX_STEPS
    assert wins == 8, f"flat: {wins}/8"
