"""Compositional plan-vector policy (models/cpv.py).

Pins the two claims of the family:

1. plan arithmetic — residual plan vectors compose additively by
   construction: plan({A, B}) = plan({A}) + plan({B});
2. compositional execution — a CPV policy cloned ONLY from single-task
   demonstrations (with noise-injected starts and plan-space goal
   relabeling, never a stacked trajectory) executes stacked goal sets.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.models.cpv import init_cpv, plan_of
from gym_craftingworld_tpu.train import bc


def test_plan_vectors_compose_additively():
    model, params = init_cpv(jax.random.PRNGKey(0), 8, 8, embed_dim=16)
    a = np.zeros(9); a[C.T_EAT_BREAD] = 1
    b = np.zeros(9); b[C.T_CHOP_ROCK] = 1
    zero = np.zeros(9)
    pa = plan_of(model, params, a, zero)
    pb = plan_of(model, params, b, zero)
    pab = plan_of(model, params, a + b, zero)
    np.testing.assert_allclose(np.asarray(pab), np.asarray(pa + pb),
                               rtol=1e-6)
    # finishing A while pursuing {A, B} leaves exactly plan({B})
    residual = plan_of(model, params, a + b, a)
    np.testing.assert_allclose(np.asarray(residual), np.asarray(pb),
                               rtol=1e-6)


def test_cpv_policy_consumes_flagship_features():
    from gym_craftingworld_tpu import ray_config, reset_from_seed
    from gym_craftingworld_tpu.models.actor_critic import obs_features

    cfg = ray_config()
    state = reset_from_seed(cfg, 0, 4)
    model, params = init_cpv(jax.random.PRNGKey(1), cfg.height, cfg.width)
    logits, value = model.apply(params, obs_features(state))
    assert logits.shape == (4, C.N_ACTIONS) and value.shape == (4,)


def test_cpv_executes_stacked_tasks_from_single_task_demos():
    base = dict(size=(8, 8), max_steps=60, fixed_init_state=6, stacking=False)
    d_eb = bc.collect_demos(100, seed=5, selected_tasks=["EatBread"],
                            random_warmup=25, **base)
    d_cr = bc.collect_demos(100, seed=5, selected_tasks=["ChopRock"],
                            random_warmup=25, **base)
    singles = bc.concat_demos(d_eb, d_cr)
    aug = bc.augment_stacked_goals(singles, 8, 8, C.T_EAT_BREAD,
                                   C.T_CHOP_ROCK)
    demos = bc.concat_demos(singles, aug)

    model, params, metrics = bc.bc_train(
        demos, jax.random.PRNGKey(0), height=8, width=8, epochs=120,
        batch_size=128, lr=2e-3,
        model_and_params=init_cpv(jax.random.PRNGKey(2), 8, 8, hidden=128),
    )
    assert metrics["accuracy"] > 0.95, metrics

    for task in ("EatBread", "ChopRock"):
        out = bc.evaluate_bc(model, params, 8, seed=5,
                             selected_tasks=[task], **base)
        assert out["success_rate"] >= 0.85, (task, out)

    kw = {k: v for k, v in base.items() if k != "stacking"}
    out = bc.evaluate_bc_stacked(model, params, 16, seed=5, n_tasks=2,
                                 selected_tasks=["EatBread", "ChopRock"],
                                 **kw)
    # trained on single-task trajectories only; stacked sets execute
    assert out["success_rate"] >= 0.6, out


def test_cpv_with_init_features():
    """The init-aware CPV variant consumes obs_features_init rows.

    The Move*/GoToHouse bits compare the live grid against the reset grid
    (craftingworld_ray.py:670-702); without the init view origin cells are
    invisible, so the compositional protocol uses this variant.
    """
    import jax
    import numpy as np

    from gym_craftingworld_tpu import flat_config, reset_from_seed
    from gym_craftingworld_tpu.models.actor_critic import (
        feature_dim_init,
        obs_features_init,
    )
    from gym_craftingworld_tpu.models.cpv import init_cpv

    model, params = init_cpv(jax.random.PRNGKey(0), 8, 8, with_init=True)
    st = reset_from_seed(flat_config(), 3, 4)
    f = obs_features_init(st)
    assert f.shape == (4, feature_dim_init(8, 8))
    logits, value = model.apply(params, f)
    assert logits.shape == (4, 6) and value.shape == (4,)
    assert np.isfinite(np.asarray(logits)).all()
    # the init block one-hots init_objects: exactly 9 cells marked per env
    grid_dim = 8 * 8 * 12
    init_block = np.asarray(f[:, grid_dim + 18:])
    assert init_block.reshape(4, 64, 9).sum() == 4 * 9
