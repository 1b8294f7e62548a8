"""State-invariant checker tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_craftingworld_tpu import ray_config, reset_from_seed, rollout_random
from gym_craftingworld_tpu.core.validate import assert_valid_state, check_state


def test_reset_states_valid():
    cfg = ray_config()
    st = reset_from_seed(cfg, 0, 32)
    assert check_state(cfg, st).all()
    assert_valid_state(cfg, st)


def test_states_stay_valid_through_rollout():
    cfg = ray_config()
    st = reset_from_seed(cfg, 1, 16)
    st, _ = rollout_random(cfg, st, jax.random.PRNGKey(0), 200)
    assert_valid_state(cfg, st)


def test_invalid_state_detected():
    cfg = ray_config()
    st = reset_from_seed(cfg, 2, 4)
    bad = st.replace(holding=jnp.asarray([7, 0, 0, 0], jnp.int32))
    ok = check_state(cfg, bad)
    assert not ok[0] and ok[1:].all()
    with pytest.raises(AssertionError, match="batch index 0"):
        assert_valid_state(cfg, bad)
