"""Recurrent (GRU) policy family tests."""

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu import EnvConfig
from gym_craftingworld_tpu.core.reset import reset_from_seed
from gym_craftingworld_tpu.models.actor_critic import feature_dim
from gym_craftingworld_tpu.models.rnn import init_params
from gym_craftingworld_tpu.train.ppo import PPOConfig
from gym_craftingworld_tpu.train.ppo_rnn import (
    init_rnn_train_state,
    train_step_rnn,
)


def test_rnn_forward_and_hidden_reset():
    D = feature_dim(5, 5)
    model, params = init_params(jax.random.PRNGKey(0), D, hidden=32,
                                batch_size=4)
    h = model.initial_state(4)
    obs = jnp.ones((4, D))
    done = jnp.array([False, False, False, False])
    h1, logits, value = model.apply(params, h, obs, done)
    assert logits.shape == (4, 6) and value.shape == (4,)
    assert not np.allclose(np.asarray(h1), 0)
    # done=True resets the carried state before integrating the new obs:
    # a reset env must produce the same hidden as a fresh one
    h2, _, _ = model.apply(params, h1, obs, jnp.array([True, False, True, False]))
    h_fresh, _, _ = model.apply(params, model.initial_state(4), obs,
                                jnp.zeros(4, bool))
    np.testing.assert_allclose(np.asarray(h2[0]), np.asarray(h_fresh[0]),
                               rtol=1e-5)
    assert not np.allclose(np.asarray(h2[1]), np.asarray(h_fresh[1]))


def test_rnn_train_step():
    cfg = EnvConfig(height=5, width=5, max_steps=10)
    ppo = PPOConfig(rollout_steps=6, num_minibatches=2, update_epochs=1,
                    hidden=32)
    B = 8
    env_state = reset_from_seed(cfg, 0, B)
    ts = init_rnn_train_state(jax.random.PRNGKey(0), cfg, ppo, B)
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        ts, env_state, key, metrics = train_step_rnn(cfg, ppo, ts, env_state, key)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(ts.update_idx) == 2
    assert ts.hidden.shape == (B, 32)
