"""Single-step fuzzing against the reference on random synthetic states.

Trajectory parity (test_parity_trajectory.py) only covers states reachable
from reset under the sampled actions. Here the oracle env is *forced* into
arbitrary synthetic states — dense object clusters, items held over objects,
edge positions, arbitrary achieved vectors — and single steps are compared
for every action, giving much wider state-space coverage of the step rules.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from gym_craftingworld_tpu import ray_config, step
from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.core.state import (
    init_codes_from_onehot,
    onehot_from_packed,
    packed_from_onehot,
    reference_onehot_from_state,
    state_from_reference,
)
from gym_craftingworld_tpu.parity import oracle

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference checkout not present"
)

H = W = 9
CFG = ray_config(height=H, width=W)


def random_synthetic(rng):
    """A random-but-valid world: up to 10 objects (dense), agent, maybe holding,
    plus a random one-of-each init layout and a random achieved vector."""
    objects = np.zeros((H, W), np.int8)
    n_obj = rng.randint(0, 11)
    cells = rng.choice(H * W, size=n_obj + 1, replace=False)
    for cell in cells[:n_obj]:
        objects[cell // W, cell % W] = rng.randint(1, 9)
    agent = np.array([cells[n_obj] // W, cells[n_obj] % W], np.int32)
    # half the time put the agent ON an object cell (legal: walk-overs)
    if n_obj and rng.rand() < 0.5:
        agent = np.array([cells[0] // W, cells[0] % W], np.int32)
    holding = rng.randint(0, 4)

    init = np.zeros((H, W), np.int8)
    icells = rng.choice(H * W, size=9, replace=False)
    for code, cell in zip(range(1, 9), icells[:8]):
        init[cell // W, cell % W] = code
    init[icells[8] // W, icells[8] % W] = C.AGENT_INIT_MARK

    achieved = rng.randint(0, 2, size=9).astype(np.int8)
    desired = rng.randint(0, 2, size=9).astype(np.int8)
    return objects, agent, holding, init, achieved, desired


def force_reference_state(env, objects, agent, holding, init, achieved, desired):
    from gym_craftingworld.envs.coordinates import Coord  # via oracle shim path

    env.obs_one_hot = onehot_from_packed(objects, agent, holding)
    env.agent_pos = Coord(int(agent[0]), int(agent[1]), H - 1, W - 1)
    init_onehot = np.zeros((H, W, C.N_CHANNELS), int)
    for r in range(H):
        for c in range(W):
            code = int(init[r, c])
            if 1 <= code <= 8:
                init_onehot[r, c, code - 1] = 1
            elif code == C.AGENT_INIT_MARK:
                init_onehot[r, c, C.N_OBJECTS] = 1
    env.INIT_OBS_VECTOR = init_onehot
    env.achieved_goal_vector = achieved[None].copy()
    env.desired_goal_vector = desired[None].copy()
    env.obs_image = env.render(env.obs_one_hot)
    env.step_num = 0


def build_our_state(objects, agent, holding, init, achieved, desired):
    from gym_craftingworld_tpu.core.state import EnvState

    return EnvState(
        objects=jnp.asarray(objects)[None],
        agent=jnp.asarray(agent)[None],
        holding=jnp.asarray([holding], jnp.int32),
        desired=jnp.asarray(desired)[None],
        achieved=jnp.asarray(achieved)[None],
        init_objects=jnp.asarray(init)[None],
        init_agent=jnp.asarray(agent)[None],
        goal_objects=jnp.asarray(objects)[None],
        goal_agent=jnp.asarray(agent)[None],
        step_num=jnp.zeros((1,), jnp.int32),
        rng=jnp.zeros((1, 2), jnp.uint32),
    )


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_single_step_fuzz(seed):
    env = oracle.make_reference_env(
        "ray", seed=0, size=(H, W), max_steps=CFG.max_steps
    )
    env.reset()
    rng = np.random.RandomState(seed)
    for trial in range(120):
        parts = random_synthetic(rng)
        for action in range(6):
            force_reference_state(env, *parts)
            ref_obs, ref_reward, ref_done, ref_info = env.step(action)

            ours = build_our_state(*parts)
            new_state, res = step(CFG, ours, jnp.asarray([action], jnp.int32))

            ctx = f"seed {seed} trial {trial} action {action}"
            assert int(res.reward[0]) == ref_reward, ctx
            np.testing.assert_array_equal(
                np.asarray(new_state.achieved[0]),
                np.array(env.achieved_goal_vector[0]),
                err_msg=ctx,
            )
            np.testing.assert_array_equal(
                reference_onehot_from_state(new_state),
                np.array(env.obs_one_hot),
                err_msg=ctx,
            )
            assert tuple(np.asarray(new_state.agent[0])) == env.agent_pos.tuple(), ctx
