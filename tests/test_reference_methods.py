"""Parity for the reference-named diagnostic methods on the env façade.

The reference exposes ``sample_state`` (craftingworld_ray.py:599),
``generate_fixed_states`` (:149), ``eval_task_edit`` (:646) and
``short_circuit_check`` (:747) as public methods; notebook code calls them on
an env instance. These tests drive both implementations with the same seed /
inputs and require identical outputs and identical post-call state.
"""

import numpy as np
import pytest

from gym_craftingworld_tpu.api import CraftingWorldEnvRay
from gym_craftingworld_tpu.parity import oracle

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference checkout not present"
)


@pytest.mark.parametrize("seed", [0, 7])
def test_sample_state_parity(seed):
    ref = oracle.make_reference_env("ray", seed=seed)
    ours = CraftingWorldEnvRay(seed=seed, rng_mode="parity")
    for _ in range(3):
        r_state, r_pos = ref.sample_state()
        o_state, o_pos = ours.sample_state()
        np.testing.assert_array_equal(o_state.astype(np.int64), np.array(r_state))
        assert o_pos.tuple() == r_pos.tuple()


def test_generate_fixed_states_parity():
    seed = 11
    ref = oracle.make_reference_env("ray", seed=seed)
    ours = CraftingWorldEnvRay(seed=seed, rng_mode="parity")
    r_list = ref.generate_fixed_states(4)
    o_list = ours.generate_fixed_states(4)
    assert len(o_list) == len(r_list) == 4
    for r_state, o_state in zip(r_list, o_list):
        np.testing.assert_array_equal(o_state.astype(np.int64), np.array(r_state))


def test_sample_state_fast_mode_shape_and_contents():
    ours = CraftingWorldEnvRay(seed=3)
    state, pos = ours.sample_state()
    assert state.shape == (21, 21, 12)
    # exactly one of each object + the agent, nothing held
    assert state[:, :, :8].sum() == 8
    assert all(state[:, :, ch].sum() == 1 for ch in range(9))
    assert state[:, :, 9:].sum() == 0
    assert state[pos.tuple()][8] == 1


@pytest.mark.parametrize("seed", [1, 13])
def test_eval_task_edit_parity(seed):
    """Lock-step episode; re-invoke eval_task_edit with crafted snapshot rows
    on both envs and require identical achieved vectors throughout."""
    ref = oracle.make_reference_env("ray", seed=seed)
    ours = CraftingWorldEnvRay(seed=seed, rng_mode="parity")
    ref.reset()
    ours.reset()
    rng = np.random.RandomState(seed + 100)
    # crafted pre-effect snapshot rows: None, bread, rock, tree, wheat, sticks
    rows = [None] + [
        np.eye(12, dtype=int)[ch] for ch in (5, 3, 4, 7, 0)
    ]
    for t in range(60):
        a = int(rng.randint(6))
        ref.step(a)
        ours.step(a)
        row = rows[t % len(rows)]
        ref.eval_task_edit(row)
        ours.eval_task_edit(row)
        np.testing.assert_array_equal(
            np.asarray(ours.achieved_goal_vector),
            np.asarray(ref.achieved_goal_vector),
            err_msg=f"step {t} row {t % len(rows)}",
        )


def test_short_circuit_check_matches_reference():
    ref = oracle.make_reference_env("ray", seed=0)
    ours = CraftingWorldEnvRay(seed=0)
    rng = np.random.RandomState(5)
    for _ in range(50):
        a = rng.randint(0, 2, size=9)
        b = a.copy() if rng.rand() < 0.5 else rng.randint(0, 2, size=9)
        for n in (1, 2, 4):
            assert ours.short_circuit_check(a, b, n) == ref.short_circuit_check(
                a, b, n
            ), (a, b, n)
        assert ours.short_circuit_check(a, b, 4) == np.array_equal(a, b)
