"""Observation-interleaved rollout (ops/obs_rollout.py) correctness.

Pins three things: the gather-free slots_to_codes reconstruction equals the
scatter-based to_grid projection; the interleaved rollout steps exactly the
same trajectory as the pure slot rollout under the same key; and the pixel
checksum equals a step-by-step host recomputation through the same renderers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_craftingworld_tpu import flat_config, ray_config, reset_from_seed
from gym_craftingworld_tpu.core import slots as slots_mod
from gym_craftingworld_tpu.ops import obs_rollout as obr
from gym_craftingworld_tpu.render.raster import (
    render_altobs,
    render_onehot,
    render_ray,
)

_RENDER = {"ray": render_ray, "altobs": render_altobs, "onehot": render_onehot}


def _slots(cfg, seed, B):
    return slots_mod.from_env_state(reset_from_seed(cfg, seed, B))


def test_slots_to_codes_equals_to_grid():
    cfg = ray_config()
    s = _slots(cfg, 0, 8)
    # advance into a scrambled mid-episode state first
    s, _ = slots_mod.rollout_slots_random(cfg, s, jax.random.PRNGKey(7), 120)
    codes = obr.slots_to_codes(cfg, s)
    objects, _, _ = slots_mod.to_grid(s, cfg)
    np.testing.assert_array_equal(np.asarray(codes),
                                  np.asarray(objects, dtype=np.int32))


def test_obs_rollout_trajectory_matches_pure_slot_rollout():
    cfg = flat_config()
    key = jax.random.PRNGKey(3)
    a = _slots(cfg, 1, 16)
    b = _slots(cfg, 1, 16)
    a, _ = slots_mod.rollout_slots_random(cfg, a, key, 150)
    b, _ = obr.rollout_obs_random(cfg, b, key, 150, "onehot")
    for la, lb, name in zip(a, b, a._fields):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb), name)


@pytest.mark.parametrize("obs_mode", ["ray", "altobs", "onehot"])
def test_obs_rollout_checksum_matches_stepwise_recompute(obs_mode):
    cfg = flat_config()
    key = jax.random.PRNGKey(11)
    B, T = 6, 40
    s = _slots(cfg, 2, B)
    ref = jax.tree.map(jnp.copy, s)

    _, checksum = obr.rollout_obs_random(cfg, s, key, T, obs_mode)

    actions = jax.random.randint(key, (T, B), 0, 6, dtype=jnp.int32)
    # uint32 wrap-add on device == plain integer sum mod 2**32 on the host
    expect = 0
    for t in range(T):
        ref, res = slots_mod.step_slots(cfg, ref, actions[t])
        objects, agent, holding = slots_mod.to_grid(ref, cfg)
        img = _RENDER[obs_mode](objects.astype(jnp.int32), agent, holding)
        expect += int(np.asarray(img, dtype=np.uint64).sum())
        expect += int(np.asarray(res.reward, dtype=np.int64).sum())
    assert int(checksum) == expect % (1 << 32)
