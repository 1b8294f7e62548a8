"""CNN (pixel) policy family: forward shapes and a full PPO step."""

import jax
import numpy as np

from gym_craftingworld_tpu import EnvConfig
from gym_craftingworld_tpu.core.reset import reset_from_seed
from gym_craftingworld_tpu.models.cnn import init_params, pixel_obs
from gym_craftingworld_tpu.train.ppo import (
    PPOConfig,
    init_train_state,
    train_step,
)


def test_cnn_forward_shapes():
    cfg = EnvConfig(height=8, width=8, max_steps=20)
    model, params = init_params(jax.random.PRNGKey(0), 8, 8, hidden=64)
    st = reset_from_seed(cfg, 0, 4)
    px, goal = pixel_obs(st)
    assert px.shape == (4, 32, 32, 3)
    logits, value = model.apply(params, px, goal)
    assert logits.shape == (4, 6) and value.shape == (4,)
    assert np.isfinite(np.asarray(logits)).all()


def test_cnn_ppo_train_step():
    cfg = EnvConfig(height=8, width=8, max_steps=20)
    ppo = PPOConfig(rollout_steps=4, num_minibatches=2, update_epochs=1,
                    hidden=32, policy="cnn")
    env_state = reset_from_seed(cfg, 0, 8)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, ppo)
    ts, env_state, key, metrics = train_step(
        cfg, ppo, ts, env_state, jax.random.PRNGKey(1)
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
