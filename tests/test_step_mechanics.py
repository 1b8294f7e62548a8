"""Unit tests of step mechanics on handcrafted states.

Covers every rule in SURVEY §2.4/§2.5 independently of the reference oracle
(see test_parity_trajectory.py for the bit-exactness runs).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gym_craftingworld_tpu import EnvConfig, EnvState, step
from gym_craftingworld_tpu import constants as C


def make_state(
    cfg,
    objects_at=(),
    agent=(2, 2),
    holding=C.HOLD_NONE,
    desired=(),
    achieved=(),
    init_objects_at=None,
    step_num=0,
):
    """Build a B=1 state. objects_at: {(r, c): code}. init defaults to objects+agent."""
    H, W = cfg.height, cfg.width
    obj = np.zeros((H, W), np.int8)
    for (r, c), code in dict(objects_at).items():
        obj[r, c] = code
    if init_objects_at is None:
        init = obj.copy()
        # agent-init mark only when the cell holds no object (reference init
        # first-nonzero gives object channels priority over the agent bit)
        if init[agent[0], agent[1]] == C.EMPTY:
            init[agent[0], agent[1]] = C.AGENT_INIT_MARK
    else:
        init = np.zeros((H, W), np.int8)
        for (r, c), code in dict(init_objects_at).items():
            init[r, c] = code
    des = np.zeros(C.N_TASKS, np.int8)
    des[list(desired)] = 1
    ach = np.zeros(C.N_TASKS, np.int8)
    ach[list(achieved)] = 1
    return EnvState(
        objects=jnp.asarray(obj)[None],
        agent=jnp.asarray([agent], jnp.int32),
        holding=jnp.asarray([holding], jnp.int32),
        desired=jnp.asarray(des)[None],
        achieved=jnp.asarray(ach)[None],
        init_objects=jnp.asarray(init)[None],
        init_agent=jnp.asarray([agent], jnp.int32),
        goal_objects=jnp.asarray(obj)[None],
        goal_agent=jnp.asarray([agent], jnp.int32),
        step_num=jnp.asarray([step_num], jnp.int32),
        rng=jnp.zeros((1, 2), jnp.uint32),
    )


CFG = EnvConfig(height=5, width=5, max_steps=100)


def do(state, action):
    st, res = step(CFG, state, jnp.asarray([action], jnp.int32))
    return st, res


def obj_at(st, r, c):
    return int(st.objects[0, r, c])


class TestMovement:
    def test_basic_moves(self):
        for action, (dr, dc) in zip(range(4), [(-1, 0), (0, 1), (1, 0), (0, -1)]):
            st, res = do(make_state(CFG, agent=(2, 2)), action)
            assert tuple(np.asarray(st.agent[0])) == (2 + dr, 2 + dc)
            assert bool(res.changed[0])

    def test_edge_clamp_is_noop(self):
        st, res = do(make_state(CFG, agent=(0, 0)), C.ACTION_UP)
        assert tuple(np.asarray(st.agent[0])) == (0, 0)
        assert not bool(res.changed[0])
        assert int(res.reward[0]) == -1

    def test_rock_blocks_without_hammer(self):
        s = make_state(CFG, objects_at={(1, 2): C.ROCK}, agent=(2, 2))
        st, res = do(s, C.ACTION_UP)
        assert tuple(np.asarray(st.agent[0])) == (2, 2)
        assert not bool(res.changed[0])
        assert obj_at(st, 1, 2) == C.ROCK

    def test_rock_chops_with_hammer(self):
        s = make_state(
            CFG, objects_at={(1, 2): C.ROCK}, agent=(2, 2), holding=C.HOLD_HAMMER
        )
        st, res = do(s, C.ACTION_UP)
        assert tuple(np.asarray(st.agent[0])) == (1, 2)
        assert obj_at(st, 1, 2) == C.EMPTY
        assert int(st.achieved[0, C.T_CHOP_ROCK]) == 1

    def test_tree_blocks_without_axe(self):
        s = make_state(CFG, objects_at={(1, 2): C.TREE}, agent=(2, 2))
        st, res = do(s, C.ACTION_UP)
        assert not bool(res.changed[0])

    def test_tree_becomes_sticks_with_axe(self):
        s = make_state(
            CFG, objects_at={(1, 2): C.TREE}, agent=(2, 2), holding=C.HOLD_AXE
        )
        st, res = do(s, C.ACTION_UP)
        assert obj_at(st, 1, 2) == C.STICKS
        assert int(st.achieved[0, C.T_CHOP_TREE]) == 1

    def test_bread_eaten_unconditionally(self):
        s = make_state(CFG, objects_at={(1, 2): C.BREAD}, agent=(2, 2))
        st, res = do(s, C.ACTION_UP)
        assert obj_at(st, 1, 2) == C.EMPTY
        assert int(st.achieved[0, C.T_EAT_BREAD]) == 1

    def test_sticks_plus_hammer_builds_house(self):
        s = make_state(
            CFG, objects_at={(1, 2): C.STICKS}, agent=(2, 2), holding=C.HOLD_HAMMER
        )
        st, res = do(s, C.ACTION_UP)
        assert obj_at(st, 1, 2) == C.HOUSE
        assert int(st.achieved[0, C.T_BUILD_HOUSE]) == 1
        # first-nonzero at the agent's cell is now the house → GoToHouse too
        assert int(st.achieved[0, C.T_GO_TO_HOUSE]) == 1

    def test_sticks_without_hammer_untouched(self):
        s = make_state(CFG, objects_at={(1, 2): C.STICKS}, agent=(2, 2))
        st, _ = do(s, C.ACTION_UP)
        assert obj_at(st, 1, 2) == C.STICKS
        assert int(st.achieved[0, C.T_BUILD_HOUSE]) == 0

    def test_wheat_plus_axe_makes_bread(self):
        s = make_state(
            CFG, objects_at={(1, 2): C.WHEAT}, agent=(2, 2), holding=C.HOLD_AXE
        )
        st, _ = do(s, C.ACTION_UP)
        assert obj_at(st, 1, 2) == C.BREAD
        assert int(st.achieved[0, C.T_MAKE_BREAD]) == 1

    def test_wheat_without_axe_untouched(self):
        s = make_state(CFG, objects_at={(1, 2): C.WHEAT}, agent=(2, 2))
        st, _ = do(s, C.ACTION_UP)
        assert obj_at(st, 1, 2) == C.WHEAT
        assert int(st.achieved[0, C.T_MAKE_BREAD]) == 0


class TestPickupDrop:
    def test_pickup(self):
        s = make_state(CFG, objects_at={(2, 2): C.AXE}, agent=(2, 2))
        st, res = do(s, C.ACTION_PICKUP)
        assert int(st.holding[0]) == C.HOLD_AXE
        assert obj_at(st, 2, 2) == C.EMPTY
        assert bool(res.changed[0])
        # pickup does NOT run task evaluation (craftingworld_ray.py:343-346)
        assert int(st.achieved[0, C.T_MOVE_AXE]) == 0

    def test_pickup_nothing(self):
        st, res = do(make_state(CFG, agent=(2, 2)), C.ACTION_PICKUP)
        assert not bool(res.changed[0])

    def test_pickup_non_pickupable(self):
        s = make_state(CFG, objects_at={(2, 2): C.BREAD}, agent=(2, 2))
        st, res = do(s, C.ACTION_PICKUP)
        assert not bool(res.changed[0])
        assert obj_at(st, 2, 2) == C.BREAD

    def test_pickup_while_holding(self):
        s = make_state(
            CFG, objects_at={(2, 2): C.AXE}, agent=(2, 2), holding=C.HOLD_HAMMER
        )
        st, res = do(s, C.ACTION_PICKUP)
        assert not bool(res.changed[0])
        assert int(st.holding[0]) == C.HOLD_HAMMER

    def test_drop_on_empty(self):
        s = make_state(CFG, agent=(2, 2), holding=C.HOLD_STICKS)
        st, res = do(s, C.ACTION_DROP)
        assert int(st.holding[0]) == C.HOLD_NONE
        assert obj_at(st, 2, 2) == C.STICKS
        assert bool(res.changed[0])

    def test_drop_on_occupied(self):
        s = make_state(
            CFG, objects_at={(2, 2): C.HOUSE}, agent=(2, 2), holding=C.HOLD_STICKS
        )
        st, res = do(s, C.ACTION_DROP)
        assert not bool(res.changed[0])
        assert int(st.holding[0]) == C.HOLD_STICKS

    def test_drop_nothing(self):
        st, res = do(make_state(CFG, agent=(2, 2)), C.ACTION_DROP)
        assert not bool(res.changed[0])


class TestTaskEval:
    def test_go_to_house_unlatches(self):
        s = make_state(CFG, objects_at={(1, 2): C.HOUSE}, agent=(2, 2))
        st, _ = do(s, C.ACTION_UP)
        assert int(st.achieved[0, C.T_GO_TO_HOUSE]) == 1
        st2, _ = do(st, C.ACTION_DOWN)
        assert int(st2.achieved[0, C.T_GO_TO_HOUSE]) == 0

    def test_move_sticks_mid_carry_and_unachieve(self):
        # Sticks at (2,3); agent picks up, steps away → achieved; steps back → 0.
        s = make_state(CFG, objects_at={(2, 3): C.STICKS}, agent=(2, 3))
        st, _ = do(s, C.ACTION_PICKUP)
        st, _ = do(st, C.ACTION_LEFT)  # now on (2,2), carrying sticks
        assert int(st.achieved[0, C.T_MOVE_STICKS]) == 1
        st, _ = do(st, C.ACTION_RIGHT)  # back on the sticks origin cell
        assert int(st.achieved[0, C.T_MOVE_STICKS]) == 0

    def test_move_sticks_chopped_tree_exemption(self):
        # Tree at (1,2); axe chops it to sticks; then hold those sticks on the
        # tree's origin → NOT moved (craftingworld_ray.py:680-682).
        s = make_state(
            CFG, objects_at={(1, 2): C.TREE}, agent=(2, 2), holding=C.HOLD_AXE
        )
        st, _ = do(s, C.ACTION_UP)  # chop tree → sticks at (1,2); on it
        st, _ = do(st, C.ACTION_DROP)  # can't drop: cell occupied by sticks
        assert int(st.holding[0]) == C.HOLD_AXE
        st, _ = do(st, C.ACTION_DOWN)  # step off
        st, _ = do(st, C.ACTION_DROP)  # drop axe at (2,2)
        st, _ = do(st, C.ACTION_UP)  # back onto sticks
        st, _ = do(st, C.ACTION_PICKUP)  # pick up the chopped sticks
        assert int(st.holding[0]) == C.HOLD_STICKS
        st, _ = do(st, C.ACTION_UP)  # move to (0,2) carrying them
        assert int(st.achieved[0, C.T_MOVE_STICKS]) == 1
        st, _ = do(st, C.ACTION_DOWN)  # back onto the tree-origin cell
        assert int(st.achieved[0, C.T_MOVE_STICKS]) == 0

    def test_move_axe_on_own_init_cell_counts(self):
        # Agent's own start cell is "else" in the reference → counts as moved.
        s = make_state(CFG, objects_at={(2, 3): C.AXE}, agent=(2, 2))
        st, _ = do(s, C.ACTION_RIGHT)
        st, _ = do(st, C.ACTION_PICKUP)
        st, _ = do(st, C.ACTION_LEFT)  # back to the agent's init cell, holding axe
        assert int(st.achieved[0, C.T_MOVE_AXE]) == 1

    def test_eval_runs_on_blocked_move(self):
        # Pickup sets no bits; a subsequent *blocked* move re-evaluates.
        s = make_state(CFG, objects_at={(0, 0): C.AXE}, agent=(0, 0))
        st, _ = do(s, C.ACTION_PICKUP)
        assert int(st.achieved[0, C.T_MOVE_AXE]) == 0
        st, res = do(st, C.ACTION_UP)  # clamped no-op, still evaluates
        assert not bool(res.changed[0])
        # axe origin cell → move_axe must be 0, and stays 0
        assert int(st.achieved[0, C.T_MOVE_AXE]) == 0

    def test_latched_bits_stay(self):
        s = make_state(CFG, objects_at={(1, 2): C.BREAD}, agent=(2, 2))
        st, _ = do(s, C.ACTION_UP)
        assert int(st.achieved[0, C.T_EAT_BREAD]) == 1
        for a in [C.ACTION_DOWN, C.ACTION_LEFT, C.ACTION_RIGHT]:
            st, _ = do(st, a)
        assert int(st.achieved[0, C.T_EAT_BREAD]) == 1


class TestRewardDone:
    def test_success_reward_and_done(self):
        s = make_state(
            CFG, objects_at={(1, 2): C.BREAD}, agent=(2, 2), desired=[C.T_EAT_BREAD]
        )
        st, res = do(s, C.ACTION_UP)
        assert int(res.reward[0]) == CFG.max_steps
        assert bool(res.done[0])

    def test_exact_match_required_by_default(self):
        # achieved ⊃ desired fails the equal-match reward.
        s = make_state(
            CFG,
            objects_at={(1, 2): C.BREAD, (1, 3): C.HOUSE},
            agent=(2, 2),
            desired=[C.T_EAT_BREAD],
        )
        st, res = do(s, C.ACTION_UP)  # eat bread
        assert int(res.reward[0]) == CFG.max_steps
        st, res = do(st, C.ACTION_RIGHT)  # also on house → superset
        assert int(res.reward[0]) == -1

    def test_subset_reward_style(self):
        cfg = CFG.replace(reward_equal=False)
        s = make_state(
            cfg,
            objects_at={(1, 2): C.BREAD, (1, 3): C.HOUSE},
            agent=(2, 2),
            desired=[C.T_EAT_BREAD],
        )
        st, res = step(cfg, s, jnp.asarray([C.ACTION_UP], jnp.int32))
        assert int(res.reward[0]) == cfg.max_steps
        st, res = step(cfg, st, jnp.asarray([C.ACTION_RIGHT], jnp.int32))
        assert int(res.reward[0]) == cfg.max_steps  # superset still succeeds

    def test_noop_gives_minus_one_even_when_goal_met(self):
        s = make_state(
            CFG,
            agent=(0, 0),
            desired=[C.T_EAT_BREAD],
            achieved=[C.T_EAT_BREAD],
        )
        st, res = do(s, C.ACTION_UP)  # edge no-op
        assert int(res.reward[0]) == -1
        assert not bool(res.done[0])

    def test_timeout_done(self):
        s = make_state(CFG, agent=(2, 2), step_num=CFG.max_steps - 1)
        st, res = do(s, C.ACTION_UP)
        assert bool(res.done[0])


class TestBatching:
    def test_batched_envs_are_independent(self):
        states = [
            make_state(CFG, objects_at={(1, 2): C.BREAD}, agent=(2, 2)),
            make_state(CFG, agent=(0, 0)),
        ]
        batched = EnvState(
            *[jnp.concatenate([getattr(s, f) for s in states]) for f in
              EnvState.__dataclass_fields__]
        )
        st, res = step(CFG, batched, jnp.asarray([C.ACTION_UP, C.ACTION_UP]))
        assert int(st.achieved[0, C.T_EAT_BREAD]) == 1
        assert int(st.achieved[1, C.T_EAT_BREAD]) == 0
        assert bool(res.changed[0]) and not bool(res.changed[1])
