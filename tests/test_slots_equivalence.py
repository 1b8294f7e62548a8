"""Exhaustive equivalence of the entity-slot fast path with the grid path.

Both layouts step the same worlds through long random action sequences; after
every step the slot state's grid projection, achieved vector, reward, and done
flag must be identical to the grid engine's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_craftingworld_tpu import EnvConfig, ray_config, flat_config, reset_from_seed, step
from gym_craftingworld_tpu.core import slots as slots_mod


@pytest.mark.parametrize(
    "cfg,seed,steps",
    [
        (ray_config(), 0, 300),
        (ray_config(), 1, 300),
        (flat_config(), 2, 400),  # 8x8: dense interactions, many collisions
        (EnvConfig(height=4, width=3, max_steps=1000), 3, 600),  # pathological
    ],
)
def test_slot_step_equals_grid_step(cfg, seed, steps):
    B = 16
    grid_state = reset_from_seed(cfg, seed, B)
    slot_state = slots_mod.from_env_state(grid_state)

    # entry conversion must round-trip exactly
    obj0, agent0, hold0 = slots_mod.to_grid(slot_state, cfg)
    np.testing.assert_array_equal(np.asarray(obj0), np.asarray(grid_state.objects))
    np.testing.assert_array_equal(np.asarray(agent0), np.asarray(grid_state.agent))
    np.testing.assert_array_equal(np.asarray(hold0), np.asarray(grid_state.holding))

    rng = np.random.RandomState(seed + 500)
    for t in range(steps):
        actions = jnp.asarray(rng.randint(6, size=B), jnp.int32)
        grid_state, gres = step(cfg, grid_state, actions)
        slot_state, sres = slots_mod.step_slots(cfg, slot_state, actions)

        np.testing.assert_array_equal(
            np.asarray(sres.reward), np.asarray(gres.reward), err_msg=f"t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(sres.done), np.asarray(gres.done), err_msg=f"t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(sres.changed), np.asarray(gres.changed), err_msg=f"t={t}"
        )
        np.testing.assert_array_equal(
            np.asarray(slot_state.achieved),
            np.asarray(grid_state.achieved),
            err_msg=f"t={t}",
        )
        if t % 10 == 0 or t == steps - 1:
            obj, agent, hold = slots_mod.to_grid(slot_state, cfg)
            np.testing.assert_array_equal(
                np.asarray(obj), np.asarray(grid_state.objects), err_msg=f"t={t}"
            )
            np.testing.assert_array_equal(
                np.asarray(agent), np.asarray(grid_state.agent), err_msg=f"t={t}"
            )
            np.testing.assert_array_equal(
                np.asarray(hold), np.asarray(grid_state.holding), err_msg=f"t={t}"
            )


def test_rollout_slots_matches_grid_rollout():
    from gym_craftingworld_tpu.core.rollout import rollout_random

    cfg = flat_config()
    B, T = 32, 128
    grid_state = reset_from_seed(cfg, 9, B)
    slot_state = slots_mod.from_env_state(grid_state)
    key = jax.random.PRNGKey(4)
    _, gout = rollout_random(cfg, grid_state, key, T)
    _, sout = slots_mod.rollout_slots_random(cfg, slot_state, key, T)
    np.testing.assert_array_equal(np.asarray(sout.reward), np.asarray(gout.reward))
    np.testing.assert_array_equal(np.asarray(sout.done), np.asarray(gout.done))
