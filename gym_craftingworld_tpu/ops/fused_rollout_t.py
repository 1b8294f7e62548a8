"""Fused Pallas rollout kernel in the transposed slot layout.

Combines the two throughput insights:
  * whole T-step rollout inside one kernel, state resident in VMEM, actions
    from the in-kernel TPU PRNG (see ops/fused_rollout.py);
  * slots on sublanes / batch on lanes ([8, B] — see ops/transposed_rollout.py),
    so every vector op fills complete (8, 128) tiles. The [BLOCK, 8] variant
    used 8 of 128 lanes per register and blew VMEM on register spills at
    block >= 2048; this layout removes both limits.

Per-env scalars are carried as [1, BLOCK] rows (2-D everywhere — Mosaic cannot
reshape i1 vectors), task rows as [9, BLOCK].
"""

from __future__ import annotations

import os as _os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.slots import HELD, ON_GRID, REMOVED, SlotState
from gym_craftingworld_tpu.ops.transposed_rollout import transpose_in, transpose_out

BLOCK = int(_os.environ.get("CW_FUSED_T_BLOCK", 4096))
_VMEM_LIMIT = 100 * 1024 * 1024


def _step_tk(cfg: EnvConfig, state, action):
    """One step; slot arrays [8, Bb], scalar rows [1, Bb], action [1, Bb]."""
    (slot_type, slot_pos_r, slot_pos_c, slot_stat, agent_r, agent_c,
     desired, achieved, init_type, init_pos_r, init_pos_c,
     init_agent_r, init_agent_c, step_num) = state

    i32 = jnp.int32
    dr = (action == C.ACTION_DOWN).astype(i32) - (action == C.ACTION_UP).astype(i32)
    dc = (action == C.ACTION_RIGHT).astype(i32) - (action == C.ACTION_LEFT).astype(i32)
    is_move = action < C.ACTION_PICKUP  # [1, Bb]

    new_r = jnp.clip(agent_r + dr, 0, cfg.height - 1)
    new_c = jnp.clip(agent_c + dc, 0, cfg.width - 1)
    moved_pos = (new_r != agent_r) | (new_c != agent_c)

    on = slot_stat == ON_GRID  # [8, Bb]
    held = slot_stat == HELD
    holding = jnp.sum(held * slot_type, axis=0, keepdims=True)  # [1, Bb]

    at_here = on & (slot_pos_r == agent_r) & (slot_pos_c == agent_c)
    at_there = on & (slot_pos_r == new_r) & (slot_pos_c == new_c)
    obj_here = jnp.sum(at_here * slot_type, axis=0, keepdims=True)
    obj_there = jnp.sum(at_there * slot_type, axis=0, keepdims=True)

    blocked = ((obj_there == C.ROCK) & (holding != C.HOLD_HAMMER)) | (
        (obj_there == C.TREE) & (holding != C.HOLD_AXE)
    )
    move_ok = is_move & moved_pos & ~blocked

    can_pickup = (
        (action == C.ACTION_PICKUP)
        & (obj_here >= C.STICKS)
        & (obj_here <= C.HAMMER)
        & (holding == C.HOLD_NONE)
    )
    can_drop = (
        (action == C.ACTION_DROP)
        & (holding != C.HOLD_NONE)
        & (obj_here == C.EMPTY)
    )

    t = slot_type
    eff_type = t
    eff_type = jnp.where(t == C.TREE, C.STICKS, eff_type)
    eff_type = jnp.where((t == C.STICKS) & (holding == C.HOLD_HAMMER), C.HOUSE,
                         eff_type)
    eff_type = jnp.where((t == C.WHEAT) & (holding == C.HOLD_AXE), C.BREAD,
                         eff_type)
    eff_removed = (t == C.ROCK) | (t == C.BREAD)

    hit = at_there & move_ok
    slot_type = jnp.where(hit, eff_type, t)
    slot_stat = jnp.where(hit & eff_removed, REMOVED, slot_stat)

    slot_stat = jnp.where(can_pickup & at_here, HELD, slot_stat)
    dropping = can_drop & held
    slot_stat = jnp.where(dropping, ON_GRID, slot_stat)
    slot_pos_r = jnp.where(dropping, agent_r, slot_pos_r)
    slot_pos_c = jnp.where(dropping, agent_c, slot_pos_c)

    agent_r = jnp.where(move_ok, new_r, agent_r)
    agent_c = jnp.where(move_ok, new_c, agent_c)

    eat = move_ok & (obj_there == C.BREAD)
    chop_rock = move_ok & (obj_there == C.ROCK)
    chop_tree = move_ok & (obj_there == C.TREE)
    make_bread = move_ok & (obj_there == C.WHEAT) & (holding == C.HOLD_AXE)
    build_house = move_ok & (obj_there == C.STICKS) & (holding == C.HOLD_HAMMER)

    a = achieved  # [9, Bb]
    row = lambda k: a[k : k + 1, :]
    a_eat = row(C.T_EAT_BREAD) | eat
    a_crock = row(C.T_CHOP_ROCK) | chop_rock
    a_ctree = row(C.T_CHOP_TREE) | chop_tree
    a_mbread = row(C.T_MAKE_BREAD) | make_bread
    a_bhouse = row(C.T_BUILD_HOUSE) | build_house

    eff_there = jnp.sum(hit * jnp.where(eff_removed, 0, eff_type), axis=0,
                        keepdims=True)
    cell_final = jnp.where(move_ok, eff_there, obj_here)
    a_house = (cell_final == C.HOUSE).astype(i32)

    at_init = (init_pos_r == agent_r) & (init_pos_c == agent_c)
    icode = jnp.sum(at_init * init_type, axis=0, keepdims=True)
    icode = jnp.where(
        (icode == 0) & (init_agent_r == agent_r) & (init_agent_c == agent_c),
        C.AGENT_INIT_MARK,
        icode,
    )
    init_empty = icode == C.EMPTY
    ms = jnp.where(
        init_empty, 1,
        jnp.where(icode == C.STICKS, 0,
                  jnp.where((icode == C.TREE) & (a_ctree == 1), 0, 1)),
    )
    ma = jnp.where(init_empty, 1, jnp.where(icode == C.AXE, 0, 1))
    mh = jnp.where(init_empty, 1, jnp.where(icode == C.HAMMER, 0, 1))

    hold_sticks = holding == C.HOLD_STICKS
    hold_axe = holding == C.HOLD_AXE
    hold_hammer = holding == C.HOLD_HAMMER

    rows = [
        jnp.where(hold_axe, a_mbread, row(C.T_MAKE_BREAD)),       # 0
        a_eat,                                                    # 1
        jnp.where(hold_hammer, a_bhouse, row(C.T_BUILD_HOUSE)),   # 2
        a_ctree,                                                  # 3
        a_crock,                                                  # 4
        a_house,                                                  # 5
        jnp.where(hold_axe, ma, row(C.T_MOVE_AXE)),               # 6
        jnp.where(hold_hammer, mh, row(C.T_MOVE_HAMMER)),         # 7
        jnp.where(hold_sticks, ms, row(C.T_MOVE_STICKS)),         # 8
    ]
    upd = jnp.concatenate(rows, axis=0).astype(i32)  # [9, Bb]
    achieved = jnp.where(is_move, upd, a)

    changed = move_ok | can_pickup | can_drop
    if cfg.reward_equal:
        success = jnp.all(achieved == desired, axis=0, keepdims=True)
    else:
        success = jnp.all(desired <= achieved, axis=0, keepdims=True)
    reward = jnp.where(changed & success, cfg.max_steps, -1).astype(i32)
    step_num = jnp.minimum(step_num + 1, cfg.max_steps)
    done = ((step_num >= cfg.max_steps) | (reward == cfg.max_steps)).astype(i32)

    new_state = (slot_type, slot_pos_r, slot_pos_c, slot_stat, agent_r, agent_c,
                 desired, achieved, init_type, init_pos_r, init_pos_c,
                 init_agent_r, init_agent_c, step_num)
    return new_state, reward, done


def _kernel(cfg, num_steps, seed_ref, *refs):
    in_refs, out_refs = refs[:14], refs[14:]
    blk = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + blk)
    state = tuple(r[:] for r in in_refs)

    o_reward, o_done = out_refs[8], out_refs[9]

    def body(t, state):
        bits = pltpu.prng_random_bits((1, state[4].shape[1]))
        action = (bits % jnp.uint32(6)).astype(jnp.int32)
        state, reward, done = _step_tk(cfg, state, action)
        o_reward[t, :] = reward[0, :]
        o_done[t, :] = done[0, :]
        return state

    state = jax.lax.fori_loop(0, num_steps, body, state)
    (o_refs := out_refs[:8])
    (st, spr, spc, ss, ar, ac, _, ach, _, _, _, _, _, sn) = state
    o_refs[0][:] = st
    o_refs[1][:] = spr
    o_refs[2][:] = spc
    o_refs[3][:] = ss
    o_refs[4][:] = ar
    o_refs[5][:] = ac
    o_refs[6][:] = ach
    o_refs[7][:] = sn


@partial(jax.jit, static_argnums=(0, 3))
def fused_rollout_t(cfg: EnvConfig, slots: SlotState, seed, num_steps: int):
    """T random-action steps in one transposed-layout Pallas kernel."""
    B = slots.agent.shape[0]
    block = min(B, BLOCK)
    assert B % block == 0, f"batch {B} must be a multiple of {block}"
    ts = transpose_in(slots)
    row = lambda x: x[None, :]
    inputs = [
        ts.slot_type, ts.slot_pos_r, ts.slot_pos_c, ts.slot_stat,
        row(ts.agent_r), row(ts.agent_c),
        ts.desired, ts.achieved,
        ts.init_type, ts.init_pos_r, ts.init_pos_c,
        row(ts.init_agent_r), row(ts.init_agent_c), row(ts.step_num),
    ]

    def spec(rows):
        return pl.BlockSpec((rows, block), lambda i, *a: (0, i),
                            memory_space=pltpu.VMEM)

    def specT():
        return pl.BlockSpec((num_steps, block), lambda i, *a: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = [
        spec(8), spec(8), spec(8), spec(8), spec(1), spec(1),
        spec(9), spec(9), spec(8), spec(8), spec(8), spec(1), spec(1), spec(1),
    ]
    out_specs = [
        spec(8), spec(8), spec(8), spec(8), spec(1), spec(1), spec(9), spec(1),
        specT(), specT(),
    ]
    sds = jax.ShapeDtypeStruct
    out_shape = [
        sds((8, B), jnp.int32), sds((8, B), jnp.int32), sds((8, B), jnp.int32),
        sds((8, B), jnp.int32), sds((1, B), jnp.int32), sds((1, B), jnp.int32),
        sds((9, B), jnp.int32), sds((1, B), jnp.int32),
        sds((num_steps, B), jnp.int32), sds((num_steps, B), jnp.int32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        partial(_kernel, cfg, num_steps),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(jnp.asarray([seed], jnp.int32), *inputs)

    (st, spr, spc, ss, ar, ac, ach, sn, rewards, dones) = outs
    new_ts = ts._replace(
        slot_type=st, slot_pos_r=spr, slot_pos_c=spc, slot_stat=ss,
        agent_r=ar[0], agent_c=ac[0], achieved=ach, step_num=sn[0],
    )
    return transpose_out(new_ts, slots.rng), rewards, dones.astype(jnp.bool_)
