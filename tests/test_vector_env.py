"""Gymnasium-style vector env adapter."""

import numpy as np

from gym_craftingworld_tpu.api.vector import CraftingWorldVectorEnv


def test_vector_env_contract():
    env = CraftingWorldVectorEnv(16, size=(8, 8), max_steps=20, seed=0)
    obs, info = env.reset()
    assert obs.shape == (16, 8, 8, 12)
    for t in range(25):
        actions = np.random.RandomState(t).randint(6, size=16)
        obs, rewards, terminated, truncated, infos = env.step(actions)
        assert obs.shape == (16, 8, 8, 12)
        assert rewards.shape == (16,)
    # 25 steps > max_steps → every env must have truncated (and autoreset)
    assert np.asarray(env.state.step_num).max() <= 20


def test_vector_env_obs_modes():
    for mode, shape in [
        ("pixels", (4, 32, 32, 3)),
        ("features", (4, 8 * 8 * 12 + 18)),
    ]:
        env = CraftingWorldVectorEnv(4, size=(8, 8), obs_mode=mode, seed=1)
        obs, _ = env.reset()
        assert obs.shape == shape, mode


def test_vector_env_autoreset_counts():
    env = CraftingWorldVectorEnv(8, size=(5, 5), max_steps=3, seed=2)
    env.reset()
    truncs = 0
    for _ in range(9):
        _, _, term, trunc, _ = env.step(np.zeros(8, np.int32))
        truncs += int(np.asarray(trunc).sum())
    assert truncs >= 16  # 3 full cycles × 8 envs - successes
