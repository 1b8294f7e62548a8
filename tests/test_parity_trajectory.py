"""Bit-exact trajectory parity against the reference implementation.

Drives the reference env (imported via the bundled gym shim) under a fixed
seed, mirrors its post-reset state into the packed JAX engine, then feeds both
the same action sequence and compares the full one-hot state, achieved-goal
vector, reward, and done flag after every single step.
"""

import numpy as np
import pytest

from gym_craftingworld_tpu import EnvConfig, flat_config, ray_config, step
from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.core.state import (
    reference_onehot_from_state,
    state_from_reference,
)
from gym_craftingworld_tpu.parity import oracle

import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference checkout not present"
)


def mirror_reference(cfg, env):
    """Capture a freshly-reset reference env into a B=1 EnvState."""
    return state_from_reference(
        cfg,
        env.obs_one_hot,
        env.INIT_OBS_VECTOR,
        np.array(env.desired_goal_vector),
        np.array(env.achieved_goal_vector),
    )


def run_lockstep(cfg, env, seed, n_steps, check_every_cell=True):
    state = mirror_reference(cfg, env)
    action_rng = np.random.RandomState(seed + 10_000)
    for t in range(n_steps):
        action = int(action_rng.randint(6))
        ref_obs, ref_reward, ref_done, ref_info = env.step(action)
        state, res = step(cfg, state, jnp.asarray([action], jnp.int32))

        assert int(res.reward[0]) == ref_reward, f"step {t}: reward mismatch"
        assert bool(res.done[0]) == ref_done, f"step {t}: done mismatch"
        np.testing.assert_array_equal(
            np.asarray(state.achieved[0]),
            np.array(env.achieved_goal_vector[0]),
            err_msg=f"step {t}: achieved-goal vector mismatch",
        )
        if check_every_cell:
            np.testing.assert_array_equal(
                reference_onehot_from_state(state),
                np.array(env.obs_one_hot),
                err_msg=f"step {t}: one-hot state mismatch",
            )
            assert tuple(np.asarray(state.agent[0])) == env.agent_pos.tuple()
        if ref_done:
            break
    return state


@pytest.mark.parametrize("seed", [0, 1, 2, 7])
def test_ray_trajectory_parity(seed):
    env = oracle.make_reference_env("ray", seed=seed)
    env.reset()
    cfg = ray_config()
    run_lockstep(cfg, env, seed, n_steps=350)


@pytest.mark.parametrize("seed", [3, 11])
def test_flat_trajectory_parity(seed):
    env = oracle.make_reference_env("flat", seed=seed)
    env.reset()
    cfg = flat_config()
    run_lockstep(cfg, env, seed, n_steps=150)


@pytest.mark.parametrize("seed", [5])
def test_onehot_trajectory_parity(seed):
    env = oracle.make_reference_env("onehot", seed=seed)
    env.reset()
    cfg = ray_config()
    run_lockstep(cfg, env, seed, n_steps=350)


def test_multi_episode_parity():
    """Several consecutive episodes: re-mirror after each reference reset."""
    seed = 42
    env = oracle.make_reference_env("ray", seed=seed)
    cfg = ray_config()
    for ep in range(3):
        env.reset()
        run_lockstep(cfg, env, seed + ep, n_steps=120, check_every_cell=True)


def test_subset_reward_parity():
    seed = 9
    env = oracle.make_reference_env("ray", seed=seed, reward_style="subset")
    env.reset()
    cfg = ray_config(reward_equal=False)
    run_lockstep(cfg, env, seed, n_steps=350)


def test_selected_tasks_parity():
    seed = 4
    selected = ["EatBread", "GoToHouse", "MoveAxe"]
    env = oracle.make_reference_env("ray", seed=seed, selected_tasks=selected)
    env.reset()
    desired = np.array(env.desired_goal_vector[0])
    allowed = np.zeros(C.N_TASKS, int)
    for t in selected:
        allowed[C.TASK_LIST.index(t)] = 1
    assert np.all(desired <= allowed)
    cfg = ray_config()
    run_lockstep(cfg, env, seed, n_steps=200)


def test_stacking_false_single_task():
    env = oracle.make_reference_env("ray", seed=8, stacking=False)
    env.reset()
    assert int(np.sum(env.desired_goal_vector)) == 1
    cfg = ray_config(stacking=False)
    run_lockstep(cfg, env, 8, n_steps=200)


@pytest.mark.parametrize("seed", [6])
def test_altobs_trajectory_parity(seed):
    """AltObs shares Ray's 21x21 mechanics (craftingworld_altobs.py:85) —
    lock-step the engine against it so all four variants are covered."""
    env = oracle.make_reference_env("altobs", seed=seed)
    env.reset()
    cfg = ray_config()
    run_lockstep(cfg, env, seed, n_steps=350)
