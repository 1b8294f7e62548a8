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


@partial(jax.jit)
def render_ray(objects, agent, holding):
    """Batched Ray-style pixels: uint8[B, 4H, 4W, 3].

    Fully branch-free: palette gather + broadcast upsample + masked agent/
    holding overlays — no per-env scatters, so the whole batch renders as a
    few fused elementwise passes (per-env dynamic_update_slice lowered to TPU
    scatters and was ~50x slower at 16k envs).
    """
    B, H, W = objects.shape
    palette = jnp.asarray(C.COLORS_N, jnp.uint8)  # [9, 3], index = packed code
    # gather colours at cell resolution (441 indices/env), then upsample —
    # the upsample is pure data movement that XLA fuses into the masked writes
    base = palette[objects.astype(jnp.int32)]  # [B, H, W, 3]
    img = jnp.repeat(jnp.repeat(base, 4, axis=1), 4, axis=2)  # [B, 4H, 4W, 3]

    # pixel-space overlay masks (all rank-3 [B, 4H, 4W]): white 2x2 block at
    # cell px [1:3, 1:3]; holding colour on its bottom row (:483-486)
    pr = jnp.arange(4 * H)
    pc = jnp.arange(4 * W)
    row_cell = (pr[None, :] // 4 == agent[:, 0:1])  # [B, 4H]
    col_cell = (pc[None, :] // 4 == agent[:, 1:2])  # [B, 4W]
    row_mid = row_cell & ((pr % 4 >= 1) & (pr % 4 <= 2))[None, :]
    col_mid = col_cell & ((pc % 4 >= 1) & (pc % 4 <= 2))[None, :]
    white = row_mid[:, :, None] & col_mid[:, None, :]
    row_bot = row_cell & (pr % 4 == 2)[None, :]
    hold_row = (
        row_bot[:, :, None]
        & col_mid[:, None, :]
        & (holding > 0)[:, None, None]
    )

    img = jnp.where(white[..., None], jnp.uint8(255), img)
    hold_color = palette[holding]  # [B, 3]
    img = jnp.where(hold_row[..., None], hold_color[:, None, None, :], img)
    return img


# ---------------------------------------------------------------------------
# AltObs: 3x3-px tiles + bottom status strip
# ---------------------------------------------------------------------------


@partial(jax.jit)
def render_altobs(objects, agent, holding):
    """Batched AltObs pixels: int16[B, (H+1)*3, 3W, 3]. Branch-free.

    int16, not uint8: a held item over the same object type doubles the tile
    slot value, so the reference emits pixel values up to 510 (2x255).
    """
    B, H, W = objects.shape
    # 9-channel per-cell activation: objects (codes 1..8 → channels 0..7),
    # agent → channel 8, held item adds into channels 0..2 of the agent cell
    # (craftingworld_altobs.py:530-533).
    ch = jax.nn.one_hot(objects.astype(jnp.int32) - 1, 9, dtype=jnp.int32)
    at_r = (jnp.arange(H)[None, :] == agent[:, 0:1])[:, :, None]
    at_c = (jnp.arange(W)[None, :] == agent[:, 1:2])[:, None, :]
    cell = (at_r & at_c)[..., None].astype(jnp.int32)  # [B, H, W, 1]
    e_agent = jax.nn.one_hot(8, 9, dtype=jnp.int32)  # channel 8
    held = jax.nn.one_hot(holding - 1, 9, dtype=jnp.int32)  # -1 → zero row
    ch = ch + cell * (e_agent[None, None, None, :] + held[:, None, None, :])

    # channel k renders at tile pixel (k // 3, k % 3) scaled by its colour
    vals = ch.reshape(B, H, W, 3, 3).transpose(0, 1, 3, 2, 4).reshape(
        B, 3 * H, 3 * W
    )
    tile_colors = jnp.asarray(np.tile(C.CPV_TILE_COLORS, (H, W, 1)), jnp.int32)
    img = vals[:, :, :, None] * tile_colors[None]

    # bottom status strip: zeros, px columns [3:6] = 255 while holding
    # (craftingworld_altobs.py:543,557-559)
    strip_cols = (jnp.arange(3 * W) >= 3) & (jnp.arange(3 * W) < 6)
    strip = jnp.where(
        (strip_cols[None, None, :, None]) & (holding > 0)[:, None, None, None],
        255,
        0,
    ) * jnp.ones((B, 3, 3 * W, 3), jnp.int32)
    return jnp.concatenate([img, strip], axis=1).astype(jnp.int16)


# ---------------------------------------------------------------------------
# OneHot: the 12-channel reference encoding
# ---------------------------------------------------------------------------


@partial(jax.jit)
def render_onehot(objects, agent, holding):
    """Batched one-hot obs: uint8[B, H, W, 12]. Branch-free masked build."""
    B, H, W = objects.shape
    obj = jax.nn.one_hot(objects.astype(jnp.int32) - 1, C.N_OBJECTS, dtype=jnp.uint8)
    at_r = (jnp.arange(H)[None, :] == agent[:, 0:1])[:, :, None]
    at_c = (jnp.arange(W)[None, :] == agent[:, 1:2])[:, None, :]
    cell = (at_r & at_c)[..., None]  # [B, H, W, 1]
    agent_ch = cell.astype(jnp.uint8)
    held = jax.nn.one_hot(holding - 1, len(C.PICKUPABLE), dtype=jnp.uint8)
    held_ch = cell.astype(jnp.uint8) * held[:, None, None, :]
    return jnp.concatenate([obj, agent_ch, held_ch], axis=-1)


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
