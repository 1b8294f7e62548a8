"""PPO harness tests: shapes, finiteness, learning signal on a tiny task."""

import jax
import numpy as np

from gym_craftingworld_tpu import EnvConfig
from gym_craftingworld_tpu.core.reset import reset_from_seed
from gym_craftingworld_tpu.train.ppo import (
    PPOConfig,
    init_train_state,
    train_step,
)


def test_train_step_runs_and_is_finite():
    cfg = EnvConfig(height=5, width=5, max_steps=10)
    ppo = PPOConfig(rollout_steps=8, num_minibatches=2, update_epochs=1, hidden=32)
    env_state = reset_from_seed(cfg, 0, 8)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, ppo)
    key = jax.random.PRNGKey(1)
    ts, env_state, key, metrics = train_step(cfg, ppo, ts, env_state, key)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(ts.update_idx) == 1


def test_params_change_and_chain():
    cfg = EnvConfig(height=5, width=5, max_steps=10)
    ppo = PPOConfig(rollout_steps=8, num_minibatches=2, update_epochs=1, hidden=32)
    env_state = reset_from_seed(cfg, 0, 8)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, ppo)
    p0 = jax.tree.map(lambda x: np.asarray(x).copy(), ts.params)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        ts, env_state, key, metrics = train_step(cfg, ppo, ts, env_state, key)
    diffs = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()),
                     p0, ts.params)
    )
    assert max(diffs) > 0


def test_checkpoint_roundtrip(tmp_path):
    import orbax.checkpoint  # noqa: F401  (skip if missing)

    from gym_craftingworld_tpu.train import checkpoint

    cfg = EnvConfig(height=5, width=5, max_steps=10)
    ppo = PPOConfig(rollout_steps=4, num_minibatches=2, update_epochs=1, hidden=16)
    env_state = reset_from_seed(cfg, 0, 4)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, ppo)
    key = jax.random.PRNGKey(5)
    path = str(tmp_path / "ckpt")
    checkpoint.save(path, ts, env_state, key, step=3)
    template = checkpoint._as_ckpt(ts, env_state, key, 0)
    restored = checkpoint.restore(path, template)
    assert restored["step"] == 3
    np.testing.assert_array_equal(
        np.asarray(restored["env_state"].objects), np.asarray(env_state.objects)
    )
    a = jax.tree.leaves(restored["train_state"]["params"])[0]
    b = jax.tree.leaves(ts.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
