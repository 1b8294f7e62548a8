"""Pixel-observation actor-critic (CNN family).

For users training from the Ray/Flat RGB renders instead of the compact
one-hot features. Convolutions run in bfloat16 NHWC; at 4x4-px cells the
84x84x3 frames reduce quickly with stride-4 then stride-2 convs (the classic
DQN stem shape), ending in the same policy/value heads as the MLP family.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.core.state import EnvState
from gym_craftingworld_tpu.render.raster import render_ray


class PixelActorCritic(nn.Module):
    """Conv torso + goal-bit fusion + policy/value heads."""

    hidden: int = 256
    n_actions: int = C.N_ACTIONS

    @nn.compact
    def __call__(self, pixels, goal_bits):
        x = pixels.astype(jnp.bfloat16) / 255.0
        x = nn.Conv(32, (8, 8), strides=(4, 4), dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (4, 4), strides=(2, 2), dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        x = nn.Conv(64, (3, 3), strides=(1, 1), dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = jnp.concatenate([x, goal_bits.astype(jnp.bfloat16)], axis=-1)
        x = nn.Dense(self.hidden, dtype=jnp.bfloat16)(x)
        x = nn.relu(x)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="policy")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        return logits, value.squeeze(-1)


def pixel_obs(state: EnvState):
    """(pixels uint8[B, 4H, 4W, 3], goal_bits f32[B, 18]) for the CNN family."""
    pixels = render_ray(state.objects, state.agent, state.holding)
    goal_bits = jnp.concatenate(
        [state.desired.astype(jnp.float32), state.achieved.astype(jnp.float32)],
        axis=-1,
    )
    return pixels, goal_bits


def init_params(key, height: int = 21, width: int = 21, hidden: int = 256):
    model = PixelActorCritic(hidden=hidden)
    dummy_px = jnp.zeros((1, height * 4, width * 4, 3), jnp.uint8)
    dummy_goal = jnp.zeros((1, 2 * C.N_TASKS), jnp.float32)
    return model, model.init(key, dummy_px, dummy_goal)
