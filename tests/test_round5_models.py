"""Round-5 model family contracts.

* CPVGridPolicy protocol purity: the ONLY route for goal information is the
  residual plan vector — the broadcast desired/achieved/residual planes and
  the residual scalar rows must be provably unread (tools/cpv_canonical.py's
  measurement is meaningless otherwise).
* D4-flip symmetry of the env core: the pixel-distillation augmentation
  (tools/pixel_distill.augment_flips) relabels actions under world flips;
  that is only sound if stepping commutes with flipping.
* PixelDistillStudent consumes exactly the stacked 3-frame image tensor.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.reset import reset as core_reset
from gym_craftingworld_tpu.core.step import step as core_step
from gym_craftingworld_tpu.models.cnn import init_student, student_images
from gym_craftingworld_tpu.models.cpv import init_cpv_grid
from gym_craftingworld_tpu.models.grid_policy import (
    N_EXTRAS,
    N_PLANES,
    planes_from_state,
)


def test_cpv_grid_policy_reads_goal_only_through_plan_vector():
    cfg = EnvConfig(height=8, width=8, max_steps=40)
    model, params = init_cpv_grid(jax.random.PRNGKey(0), cfg, channels=8,
                                  hidden=32)
    st = core_reset(cfg, jax.random.key_data(
        jax.random.split(jax.random.PRNGKey(1), 4)))
    planes, extras = planes_from_state(cfg, st)
    logits, value = model.apply(params, planes, extras)
    assert logits.shape == (4, C.N_ACTIONS)

    # scrambling the goal/residual PLANES (channels 18+) must change nothing
    key = jax.random.PRNGKey(2)
    planes_scrambled = planes.at[..., 18:].set(
        jax.random.uniform(key, planes[..., 18:].shape, jnp.bfloat16))
    l2, _ = model.apply(params, planes_scrambled, extras)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(l2))

    # scrambling the residual scalar rows (extras[22:-2]) must change nothing
    extras_scrambled = extras.at[..., 22:-2].set(
        jax.random.uniform(key, extras[..., 22:-2].shape, jnp.bfloat16))
    l3, _ = model.apply(params, planes, extras_scrambled)
    np.testing.assert_array_equal(np.asarray(logits), np.asarray(l3))

    # but flipping a desired bit (which changes the plan vector) must
    des = extras[..., 4:13]
    extras_goal = extras.at[..., 4:13].set(1.0 - des)
    l4, _ = model.apply(params, planes, extras_goal)
    assert not np.array_equal(np.asarray(logits), np.asarray(l4))


def _flip_state(cfg, s, axis):
    """Vertical (axis=0) or horizontal (axis=1) world flip."""
    flip_grid = (lambda g: g[:, ::-1]) if axis == 0 else (
        lambda g: g[:, :, ::-1])
    lim = (cfg.height if axis == 0 else cfg.width) - 1

    def flip_rc(rc):
        r, c = rc[:, 0], rc[:, 1]
        return jnp.stack(
            [lim - r, c] if axis == 0 else [r, lim - c], -1)

    return s.replace(
        objects=flip_grid(s.objects),
        init_objects=flip_grid(s.init_objects),
        goal_objects=flip_grid(s.goal_objects),
        agent=flip_rc(s.agent),
        init_agent=flip_rc(s.init_agent),
        goal_agent=flip_rc(s.goal_agent),
    )


def test_flip_symmetry_of_step():
    """step(flip(s), perm(a)) == flip(step(s, a)) for both flips — the
    soundness condition of the distillation flip augmentation."""
    cfg = EnvConfig(height=7, width=9, max_steps=40)
    B = 64
    perms = {0: np.array([2, 1, 0, 3, 4, 5]), 1: np.array([0, 3, 2, 1, 4, 5])}
    st = core_reset(cfg, jax.random.key_data(
        jax.random.split(jax.random.PRNGKey(0), B)))
    for i in range(10):  # walk into varied mid-episode states
        a = jax.random.randint(jax.random.PRNGKey(i), (B,), 0, 6)
        st, _ = core_step(cfg, jax.tree.map(lambda x: x.copy(), st), a)

    a = np.random.RandomState(1).randint(0, 6, B)
    for axis, perm in perms.items():
        # copy both inputs: core_step donates, and the flipped state shares
        # the unflipped leaves (holding/masks/step) with ``st``
        stf = jax.tree.map(lambda x: x.copy(), _flip_state(cfg, st, axis))
        st2, res = core_step(
            cfg, jax.tree.map(lambda x: x.copy(), st), jnp.asarray(a))
        stf2, resf = core_step(cfg, stf, jnp.asarray(perm[a]))
        ref = _flip_state(cfg, st2, axis)
        for f in ("objects", "agent", "holding", "achieved", "desired"):
            np.testing.assert_array_equal(
                np.asarray(getattr(stf2, f)), np.asarray(getattr(ref, f)),
                err_msg=f"axis={axis} field={f}")
        np.testing.assert_array_equal(
            np.asarray(res.reward), np.asarray(resf.reward))


def test_pixel_student_shapes():
    cfg = EnvConfig(height=8, width=8, max_steps=40)
    model, params = init_student(jax.random.PRNGKey(0), cfg, channels=8,
                                 hidden=32, stem=8)
    st = core_reset(cfg, jax.random.key_data(
        jax.random.split(jax.random.PRNGKey(1), 4)))
    init_nomark = jnp.where(
        st.init_objects == C.AGENT_INIT_MARK, 0, st.init_objects)
    imgs = student_images(cfg, st.objects, st.agent, st.holding,
                          st.goal_objects, st.goal_agent, init_nomark,
                          st.init_agent)
    assert imgs.shape == (4, 32, 32, 9) and imgs.dtype == jnp.uint8
    logits, value = model.apply(params, imgs)
    assert logits.shape == (4, C.N_ACTIONS) and value.shape == (4,)
