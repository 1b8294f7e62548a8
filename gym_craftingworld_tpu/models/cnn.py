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


class PixelDistillStudent(nn.Module):
    """Images-only policy for the canonical setting (distillation student).

    Consumes EXACTLY the reference's pixel observation content
    (craftingworld_ray.py:84-92): the current frame, the imagined
    desired-goal frame, and the init frame, stacked channel-wise as
    [B, 4H, 4W, 9]. No goal bits, no achieved vector, no step counter —
    every piece of goal/progress information must be read out of pixels
    (latched bits are current-vs-init differences; Move*/GoToHouse are
    position-vs-init comparisons; holding is the agent-cell overlay color).

    The stem is a 4x4/stride-4 conv aligned to the renderer's 4x4-px cells
    (render/raster.render_ray), so after one layer the net is back on the
    H x W cell lattice where a GridPolicy-shaped trunk does the planning.
    """

    channels: int = 96
    hidden: int = 1536
    stem: int = 64
    n_actions: int = C.N_ACTIONS

    @nn.compact
    def __call__(self, images):
        x = images.astype(jnp.bfloat16) / 255.0
        x = nn.Conv(self.stem, (4, 4), strides=(4, 4), dtype=jnp.bfloat16,
                    name="stem")(x)  # [B, H, W, stem]
        x = nn.relu(x)
        for i in range(3):
            x = nn.Conv(self.channels, (3, 3), dtype=jnp.bfloat16,
                        name=f"conv{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(32, (1, 1), dtype=jnp.bfloat16, name="squeeze")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.hidden, dtype=jnp.bfloat16, name="dense0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.hidden // 2, dtype=jnp.bfloat16, name="dense1")(x)
        x = nn.relu(x)
        logits = nn.Dense(self.n_actions, dtype=jnp.float32, name="policy")(x)
        value = nn.Dense(1, dtype=jnp.float32, name="value")(x)
        return logits, value.squeeze(-1)


def student_images(cfg, objects, agent, holding, goal_objects, goal_agent,
                   init_objects, init_agent):
    """(current, goal, init) Ray frames stacked on channels: uint8[B,4H,4W,9].

    The goal and init frames render with holding=0 and the episode's
    imagined/init agent cells — matching the reference's desired_goal and
    init_observation images (craftingworld_ray.py:191-196).
    """
    zero = jnp.zeros_like(holding)
    cur = render_ray(objects, agent, holding)
    goal = render_ray(goal_objects, goal_agent, zero)
    init = render_ray(init_objects, init_agent, zero)
    return jnp.concatenate([cur, goal, init], axis=-1)


def init_student(key, cfg, channels: int = 96, hidden: int = 1536,
                 stem: int = 64):
    model = PixelDistillStudent(channels=channels, hidden=hidden, stem=stem)
    dummy = jnp.zeros((1, 4 * cfg.height, 4 * cfg.width, 9), jnp.uint8)
    return model, model.init(key, dummy)
