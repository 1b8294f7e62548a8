"""Recurrent actor-critic (GRU family).

For task curricula with partial observability or memory demands (e.g. masked
observations, goal inference). The GRU carries per-env hidden state across the
episode and resets it wherever an episode boundary (done) occurred — handled
inside the scan so rollouts stay a single fused on-device loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gym_craftingworld_tpu import constants as C


class RecurrentActorCritic(nn.Module):
    """obs encoder → GRU → policy/value heads. One step per call."""

    hidden: int = 256
    n_actions: int = C.N_ACTIONS

    @nn.compact
    def __call__(self, hidden, obs, done):
        """(h[B,H], obs[B,D], done bool[B]) → (h'[B,H], logits, value)."""
        x = obs.astype(jnp.bfloat16)
        x = nn.Dense(self.hidden, dtype=jnp.bfloat16, name="encoder")(x)
        x = nn.relu(x)
        # reset hidden at episode boundaries before integrating the new obs
        hidden = jnp.where(done[:, None], jnp.zeros_like(hidden), hidden)
        hidden, y = nn.GRUCell(self.hidden, dtype=jnp.bfloat16, name="gru")(
            hidden.astype(jnp.bfloat16), x
        )
        hidden = hidden.astype(jnp.float32)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="policy")(y)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(y)
        return hidden, logits, value.squeeze(-1)

    def initial_state(self, batch_size: int):
        return jnp.zeros((batch_size, self.hidden), jnp.float32)


def init_params(key, feature_dim: int, hidden: int = 256, batch_size: int = 1):
    model = RecurrentActorCritic(hidden=hidden)
    h0 = model.initial_state(batch_size)
    dummy = jnp.zeros((batch_size, feature_dim), jnp.float32)
    done = jnp.zeros((batch_size,), bool)
    return model, model.init(key, h0, dummy, done)
