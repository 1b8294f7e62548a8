"""On-device batched rendering.

Reference renderers re-implemented as fixed-shape array programs:

  * Ray/Flat 4x4-px tiles (`craftingworld_ray.py:442-520`): per-cell palette
    gather + broadcast upsample (instead of ``np.repeat``), agent 2x2 white
    block at cell px [1:3,1:3], holding colour on the bottom row [2:3,1:3].
  * AltObs 3x3-px tiles + status strip (`craftingworld_altobs.py:489-595`):
    each of 9 channels maps to a fixed pixel slot in the tile
    (``OBJECT_ENCODING_M``/``COLORS_A_M``), held items add into slots 0-2 of
    the agent's tile (so a held item over the same object doubles the slot
    value — reference behaviour preserved), and a 3-px strip is appended at
    the bottom with px columns [3:6] set to 255 while holding.
  * OneHot (`carftingworld_onehot.py:84-103`): the raw 12-channel one-hot.

Output dtype is uint8 (values are 0..255); the reference emits int64 arrays —
parity tests compare after a cast.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.core.state import EnvState

# ---------------------------------------------------------------------------
# Ray / Flat: 4x4-px tiles
# ---------------------------------------------------------------------------


def _render_ray_one(objects, agent, holding):
    """(int8[H,W], int32[2], int32) -> uint8[4H,4W,3]."""
    H, W = objects.shape
    palette = jnp.asarray(C.COLORS_N, jnp.uint8)  # [9, 3], index = packed code
    base = palette[objects.astype(jnp.int32)]  # [H, W, 3]
    # broadcast upsample x4 both axes (reference np.repeat x4, :478-479)
    img = jnp.broadcast_to(base[:, None, :, None, :], (H, 4, W, 4, 3))
    img = img.reshape(4 * H, 4 * W, 3)

    # agent overlay: white 2x2 at [4r+1:4r+3, 4c+1:4c+3]; when holding, the
    # bottom row [4r+2, 4c+1:4c+3] takes COLORS_N[holding] (:483-486)
    hold_color = palette[holding]
    patch = jnp.stack(
        [
            jnp.full((2, 3), 255, jnp.uint8),
            jnp.where(holding > 0, hold_color, jnp.uint8(255))[None, :].repeat(
                2, axis=0
            ),
        ]
    )  # [2 rows, 2 cols, 3]
    img = jax.lax.dynamic_update_slice(
        img, patch, (4 * agent[0] + 1, 4 * agent[1] + 1, 0)
    )
    return img


@partial(jax.jit)
def render_ray(objects, agent, holding):
    """Batched Ray-style pixels: uint8[B, 4H, 4W, 3]."""
    return jax.vmap(_render_ray_one)(objects, agent, holding)


# ---------------------------------------------------------------------------
# AltObs: 3x3-px tiles + bottom status strip
# ---------------------------------------------------------------------------


def _render_altobs_one(objects, agent, holding):
    """(int8[H,W], int32[2], int32) -> uint8[(H+1)*3, 3W, 3]."""
    H, W = objects.shape
    # 9-channel per-cell activation: objects (codes 1..8 → channels 0..7),
    # agent → channel 8, held item adds into channels 0..2 of the agent cell
    # (craftingworld_altobs.py:530-533).
    ch = jax.nn.one_hot(objects.astype(jnp.int32) - 1, 9, dtype=jnp.int32)
    ch = ch.at[agent[0], agent[1], 8].add(1)
    held = jax.nn.one_hot(holding - 1, 9, dtype=jnp.int32)  # -1 → all-zero row
    ch = ch.at[agent[0], agent[1], :].add(held)

    # channel k renders at tile pixel (k // 3, k % 3) scaled by its colour
    vals = ch.reshape(H, W, 3, 3).transpose(0, 2, 1, 3).reshape(3 * H, 3 * W)
    tile_colors = jnp.asarray(
        np.tile(C.CPV_TILE_COLORS, (H, W, 1)), jnp.int32
    )  # [3H, 3W, 3]
    img = vals[:, :, None] * tile_colors

    # bottom status strip: zeros, px columns [3:6] = 255 while holding
    # (craftingworld_altobs.py:543,557-559)
    strip = jnp.zeros((3, 3 * W, 3), jnp.int32)
    strip = strip.at[:, 3:6, :].set(jnp.where(holding > 0, 255, 0))
    # int16, not uint8: a held item over the same object type doubles the tile
    # slot value, so the reference emits pixel values up to 510 (2x255).
    return jnp.concatenate([img, strip], axis=0).astype(jnp.int16)


@partial(jax.jit)
def render_altobs(objects, agent, holding):
    """Batched AltObs pixels: uint8[B, (H+1)*3, 3W, 3]."""
    return jax.vmap(_render_altobs_one)(objects, agent, holding)


# ---------------------------------------------------------------------------
# OneHot: the 12-channel reference encoding
# ---------------------------------------------------------------------------


def _onehot_one(objects, agent, holding):
    """(int8[H,W], int32[2], int32) -> uint8[H, W, 12]."""
    obj = jax.nn.one_hot(objects.astype(jnp.int32) - 1, C.N_OBJECTS, dtype=jnp.uint8)
    H, W = objects.shape
    extra = jnp.zeros((H, W, 1 + len(C.PICKUPABLE)), jnp.uint8)
    out = jnp.concatenate([obj, extra], axis=-1)
    out = out.at[agent[0], agent[1], C.N_OBJECTS].set(1)
    held = jax.nn.one_hot(holding - 1, len(C.PICKUPABLE), dtype=jnp.uint8)
    out = out.at[agent[0], agent[1], C.N_OBJECTS + 1 :].add(held)
    return out


@partial(jax.jit)
def render_onehot(objects, agent, holding):
    """Batched one-hot obs: uint8[B, H, W, 12]."""
    return jax.vmap(_onehot_one)(objects, agent, holding)


# ---------------------------------------------------------------------------
# State-level helpers (current / init / goal views)
# ---------------------------------------------------------------------------


def _init_views(state: EnvState):
    """Strip the agent-init marker: init grid codes 9 → empty for rendering."""
    init_obj = jnp.where(
        state.init_objects == C.AGENT_INIT_MARK,
        jnp.int8(0),
        state.init_objects,
    )
    return init_obj, state.init_agent


def state_images_ray(state: EnvState):
    """The reference Ray observation dict, rendered on demand
    (craftingworld_ray.py:194-196,359-360): observation == achieved_goal."""
    zeros = jnp.zeros_like(state.holding)
    cur = render_ray(state.objects, state.agent, state.holding)
    init_obj, init_agent = _init_views(state)
    return {
        "observation": cur,
        "achieved_goal": cur,
        "desired_goal": render_ray(state.goal_objects, state.goal_agent, zeros),
        "init_observation": render_ray(init_obj, init_agent, zeros),
    }


def state_images_altobs(state: EnvState, stacked: bool = False):
    zeros = jnp.zeros_like(state.holding)
    cur = render_altobs(state.objects, state.agent, state.holding)
    init_obj, init_agent = _init_views(state)
    out = {
        "observation": cur,
        "achieved_goal": cur,
        "desired_goal": render_altobs(state.goal_objects, state.goal_agent, zeros),
        "init_observation": render_altobs(init_obj, init_agent, zeros),
    }
    if stacked:
        # (B, 4, ph, pw, 3) — reference stacks the four images on a new axis 0
        # for a single env (craftingworld_altobs.py:258-259,408-411).
        return jnp.stack(
            [out["observation"], out["desired_goal"], out["achieved_goal"],
             out["init_observation"]],
            axis=1,
        )
    return out


def state_obs_onehot(state: EnvState):
    """Reference OneHot observation dict (carftingworld_onehot.py:202-207):
    desired_goal is the imagined final one-hot *state*, not a render."""
    zeros = jnp.zeros_like(state.holding)
    cur = render_onehot(state.objects, state.agent, state.holding)
    init_obj, init_agent = _init_views(state)
    return {
        "observation": cur,
        "achieved_goal": cur,
        "desired_goal": render_onehot(state.goal_objects, state.goal_agent, zeros),
        "init_observation": render_onehot(init_obj, init_agent, zeros),
    }
