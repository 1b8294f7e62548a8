"""Imitation-learning pipeline: expert demos → behavioral cloning → eval.

Uses a fixed-init-state pool so the cloned policy is evaluated on exactly the
demonstrated layouts — a deterministic end-to-end check of the whole
pipeline (expert, dataset, trainer, greedy eval)."""

import numpy as np

import jax

from gym_craftingworld_tpu.train import bc

_ENV_KW = dict(
    size=(8, 8),
    max_steps=60,
    fixed_init_state=6,
    selected_tasks=["EatBread"],
    stacking=False,
)


def _demos():
    return bc.collect_demos(num_episodes=36, seed=5, **_ENV_KW)


def test_collect_demos_shapes_and_success_filter():
    demos = _demos()
    assert demos.features.ndim == 2 and demos.features.shape[1] == 8 * 8 * 12 + 18
    assert demos.actions.shape == (demos.features.shape[0],)
    assert demos.actions.min() >= 0 and demos.actions.max() <= 5
    assert demos.num_episodes >= 30  # expert solves essentially all of these
    # episodes are short: EatBread on an 8x8 pool needs far fewer than 60 steps
    counts = np.bincount(demos.episode)
    assert counts.max() < 60


def test_demos_save_load_roundtrip(tmp_path):
    demos = _demos()
    path = str(tmp_path / "demos.npz")
    demos.save(path)
    loaded = bc.Demos.load(path)
    np.testing.assert_array_equal(loaded.features, demos.features)
    np.testing.assert_array_equal(loaded.actions, demos.actions)
    np.testing.assert_array_equal(loaded.episode, demos.episode)


def test_bc_learns_and_reaches_goals():
    demos = _demos()
    model, params, metrics = bc.bc_train(
        demos, jax.random.PRNGKey(0), height=8, width=8, hidden=128,
        epochs=150, batch_size=64, lr=2e-3,
    )
    assert metrics["loss"][-1] < metrics["loss"][0] / 10, metrics["loss"]
    assert metrics["accuracy"] > 0.95, metrics

    out = bc.evaluate_bc(model, params, num_episodes=12, seed=5, **_ENV_KW)
    assert out["success_rate"] >= 0.9, out
