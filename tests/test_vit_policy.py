"""ViT (grid-attention) policy family: forward shapes and a full PPO step."""

import jax
import numpy as np

from gym_craftingworld_tpu import EnvConfig
from gym_craftingworld_tpu.core.reset import reset_from_seed
from gym_craftingworld_tpu.models.vit import grid_tokens, init_params
from gym_craftingworld_tpu.train.ppo import (
    PPOConfig,
    init_train_state,
    train_step,
)


def test_vit_forward_shapes():
    cfg = EnvConfig(height=8, width=8, max_steps=20)
    model, params = init_params(jax.random.PRNGKey(0), 8, 8, hidden=32)
    st = reset_from_seed(cfg, 0, 4)
    cells, goal = grid_tokens(st)
    assert cells.shape == (4, 64, 12)
    logits, value = model.apply(params, cells, goal)
    assert logits.shape == (4, 6) and value.shape == (4,)
    assert np.isfinite(np.asarray(logits, np.float32)).all()


def test_vit_tokens_see_the_board():
    # moving an object must change the token grid the policy consumes
    cfg = EnvConfig(height=8, width=8, max_steps=20)
    st = reset_from_seed(cfg, 0, 2)
    cells, _ = grid_tokens(st)
    flat = np.asarray(cells).reshape(2, -1)
    assert not np.array_equal(flat[0], flat[1])  # different worlds differ


def test_vit_ppo_train_step():
    cfg = EnvConfig(height=8, width=8, max_steps=20)
    ppo = PPOConfig(rollout_steps=4, num_minibatches=2, update_epochs=1,
                    hidden=32, policy="vit")
    env_state = reset_from_seed(cfg, 0, 8)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, ppo)
    ts, env_state, key, metrics = train_step(
        cfg, ppo, ts, env_state, jax.random.PRNGKey(1)
    )
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
