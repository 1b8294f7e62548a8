"""Sharding and multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from gym_craftingworld_tpu import EnvConfig, ray_config, rollout_random, step
from gym_craftingworld_tpu.parallel.mesh import (
    ENV_AXIS,
    env_sharding,
    make_env_mesh,
    reset_sharded,
    shard_state,
)


def test_reset_sharded_layout():
    mesh = make_env_mesh()
    cfg = ray_config()
    st = reset_sharded(cfg, 0, 64, mesh)
    assert st.objects.sharding.spec == P(ENV_AXIS)
    assert st.desired.sharding.spec == P(ENV_AXIS)
    # one-of-each invariant holds in every shard
    assert int((np.asarray(st.objects) > 0).sum()) == 64 * 8


def test_sharded_step_stays_sharded():
    mesh = make_env_mesh()
    cfg = ray_config()
    st = reset_sharded(cfg, 0, 64, mesh)
    st2, res = step(cfg, st, jnp.zeros(64, jnp.int32))
    assert st2.objects.sharding.spec == P(ENV_AXIS)
    assert res.reward.sharding.spec == P(ENV_AXIS)


def test_trajectories_independent_of_mesh_layout():
    """Multi-host determinism (BASELINE config 5): per-env keys derive from the
    seed alone, so the same seed gives identical trajectories on 1 vs 8 devices."""
    cfg = EnvConfig(height=8, width=8, max_steps=50)
    key = jax.random.PRNGKey(3)

    mesh1 = make_env_mesh(1)
    st1 = reset_sharded(cfg, 7, 32, mesh1)
    _, out1 = rollout_random(cfg, st1, key, 40)

    mesh8 = make_env_mesh(8)
    st8 = reset_sharded(cfg, 7, 32, mesh8)
    _, out8 = rollout_random(cfg, st8, key, 40)

    np.testing.assert_array_equal(np.asarray(out1.reward), np.asarray(out8.reward))
    np.testing.assert_array_equal(np.asarray(out1.done), np.asarray(out8.done))


def test_batch_must_divide_mesh():
    mesh = make_env_mesh()
    with pytest.raises(ValueError):
        reset_sharded(ray_config(), 0, 13, mesh)


def test_shard_existing_state():
    from gym_craftingworld_tpu import reset_from_seed

    mesh = make_env_mesh()
    st = reset_from_seed(ray_config(), 0, 16)
    st = shard_state(st, mesh)
    assert st.objects.sharding == env_sharding(mesh)


def test_graft_entry_single_chip():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    logits, value = jax.jit(fn)(*args)
    assert logits.shape == (64, 6)
    assert value.shape == (64,)
    assert np.isfinite(np.asarray(logits)).all()


def test_graft_entry_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
