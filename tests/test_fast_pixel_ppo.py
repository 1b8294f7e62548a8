"""Fast pixel/grid-observation PPO (train/fast_pixel_ppo.py).

The load-bearing claim is observation fidelity: the on-the-fly rendered grid
the CNN consumes must equal the reference one-hot observation
(render/raster.render_onehot ≙ craftingworld_ray.py:94-98) at every state.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu import flat_config, ray_config, reset_from_seed
from gym_craftingworld_tpu.core import slots as sm
from gym_craftingworld_tpu.core.rollout import rollout_random
from gym_craftingworld_tpu.ops import packed_rollout as pr
from gym_craftingworld_tpu.ops.transposed_rollout import transpose_in
from gym_craftingworld_tpu.render.raster import render_onehot
from gym_craftingworld_tpu.train import fast_pixel_ppo as fpx
from gym_craftingworld_tpu.train.demos import bits_to_mask


def _packed_from_state(cfg, state):
    return pr.pack(cfg, transpose_in(sm.from_env_state(state)))


def test_render_grid_obs_matches_reference_onehot():
    cfg = ray_config()
    state = reset_from_seed(cfg, 11, 32)
    state, _ = rollout_random(cfg, state, jax.random.PRNGKey(1), 90)
    packed = _packed_from_state(cfg, state)
    grid, bits = fpx.render_grid_obs(cfg, packed)
    ref = np.asarray(
        render_onehot(state.objects, state.agent, state.holding)
    )
    np.testing.assert_array_equal(
        np.asarray(grid, np.float32).astype(np.uint8), ref
    )
    bits = np.asarray(bits, np.float32)
    np.testing.assert_array_equal(
        bits[:, :9].astype(np.int8), np.asarray(state.desired)
    )
    np.testing.assert_array_equal(
        bits[:, 9:18].astype(np.int8), np.asarray(state.achieved)
    )
    hold = np.asarray(state.holding)
    np.testing.assert_array_equal(bits[:, 18:].argmax(1), hold)


def test_train_step_pixel_smoke():
    cfg = flat_config()
    ppo = fpx.PixelPPOConfig(rollout_steps=8, num_minibatches=2,
                             update_epochs=1, conv1=8, conv2=8, hidden=32)
    B = 64
    key = jax.random.PRNGKey(0)
    ts = fpx.init_pixel_train_state(key, cfg, ppo)
    env = fpx.fresh_packed_batch(cfg, jax.random.fold_in(key, 1), B)
    ts, env, key, metrics = fpx.train_step_pixel(cfg, ppo, ts, env, key)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["entropy"]))
    assert int(ts.update_idx) == 1
    assert env.agent_r.shape == (B,)
    # a second update runs off the carried state
    ts, env, key, metrics = fpx.train_step_pixel(cfg, ppo, ts, env, key)
    assert int(ts.update_idx) == 2
    assert np.isfinite(float(metrics["loss"]))


def test_train_many_pixel_matches_sequential():
    cfg = flat_config()
    ppo = fpx.PixelPPOConfig(rollout_steps=4, num_minibatches=2,
                             update_epochs=1, conv1=8, conv2=8, hidden=32)
    B = 64
    key = jax.random.PRNGKey(7)
    ts = fpx.init_pixel_train_state(key, cfg, ppo)
    env = fpx.fresh_packed_batch(cfg, jax.random.fold_in(key, 1), B)
    ts2 = jax.tree.map(jnp.copy, ts)
    env2 = jax.tree.map(jnp.copy, env)

    k = jax.random.PRNGKey(9)
    losses = []
    for _ in range(3):
        ts, env, k, m = fpx.train_step_pixel(cfg, ppo, ts, env, k)
        losses.append(float(m["loss"]))
    _, _, _, m_many = fpx.train_many_pixel(
        cfg, ppo, ts2, env2, 3, jax.random.PRNGKey(9)
    )
    np.testing.assert_allclose(
        np.asarray(m_many["loss"]), np.asarray(losses), rtol=2e-4
    )
