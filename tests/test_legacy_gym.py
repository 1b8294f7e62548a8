"""Legacy ``gym.make`` entry points.

The reference registers its ids with classic gym at import time
(gym_craftingworld/__init__.py:5-18). ``register_legacy_gym`` reproduces that
surface — against real legacy gym when installed, else against the bundled
parity shim — so code written for ``gym.make('craftingworld-v3')`` works
unchanged.
"""

import numpy as np

from gym_craftingworld_tpu.api import registry
from gym_craftingworld_tpu.api.gym_env import (
    CraftingWorldEnvFlat,
    CraftingWorldEnvOneHot,
    CraftingWorldEnvRay,
)


def test_legacy_gym_make_reference_ids():
    assert registry.register_legacy_gym(use_bundled_shim=True)
    import gym

    env = gym.make("craftingworld-v3")
    assert isinstance(env, CraftingWorldEnvRay)
    # reference default kwargs applied (gym_craftingworld/__init__.py:7)
    assert env.cfg.stacking is True
    assert env.render_save_rate == 10

    obs = env.reset()
    assert set(obs) == {
        "observation",
        "desired_goal",
        "achieved_goal",
        "init_observation",
    }
    obs, reward, done, info = env.step(0)
    assert isinstance(reward, int) and isinstance(done, bool)

    assert isinstance(gym.make("craftingworldflat-v3"), CraftingWorldEnvFlat)
    assert isinstance(
        gym.make("craftingworldonehot-v3"), CraftingWorldEnvOneHot
    )


def test_legacy_gym_make_kwarg_overrides():
    assert registry.register_legacy_gym(use_bundled_shim=True)
    import gym

    env = gym.make("craftingworld-v3", size=(8, 8), stacking=False)
    assert (env.STATE_W, env.STATE_H) == (8, 8)
    assert env.cfg.stacking is False
    obs = env.reset()
    assert obs["observation"].shape == (32, 32, 3)
    assert np.asarray(env.desired_goal_vector).sum() == 1  # stacking off
