"""Pallas TPU kernel: fully fused multi-step rollout over the slot layout.

The scan-based rollout (core/slots.py) dispatches one XLA computation per env
step; at CraftingWorld's tiny per-step arithmetic the chip spends most of its
time on kernel launches and HBM round-trips of the state. This kernel runs the
ENTIRE T-step rollout in one ``pallas_call``:

  * the env-block's slot state lives in VMEM for all T steps,
  * actions are generated in-kernel from the TPU PRNG
    (``pltpu.prng_random_bits``), so no [T, B] action tensor ever touches HBM,
  * per-step work is a handful of [BLOCK, 8] VPU ops (see core/slots.py for
    the layout's semantics and the grid-path equivalence proof),
  * outputs: final state + per-step rewards/dones.

The grid is tiled over env blocks; each block is independent (envs never
interact), so there is no cross-program communication.

Mosaic notes: per-env scalars are carried as 2-D ``[BLOCK, 1]`` columns
throughout — Mosaic cannot insert/delete minor dims on i1 (bool) vectors, so
the kernel never reshapes booleans; reductions use ``keepdims=True`` and
row-writes slice 32-bit values only.

Action-stream note: the seeded entry point draws its own uniform action stream
(throughput engine: random-policy rollouts, load generation, benchmarking);
``fused_rollout_actions`` consumes an explicit [T, B] action tensor instead
(equivalence tests, scripted replays). Policy-driven training uses the scan
path, whose per-step obs→policy→action loop requires the state each step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.slots import HELD, ON_GRID, REMOVED, SlotState

# Max envs per program instance. Bigger blocks mean wider VPU ops per step
# (CraftingWorld's per-step arithmetic is tiny, so per-op width is what hides
# latency); the [T, BLOCK] reward/done slabs dominate VMEM, so the kernel
# raises the scoped-VMEM limit (v5e has 128 MB physical VMEM; the compiler
# default budget is a conservative 16 MB).
# (compile time grows steeply with block width through Mosaic; 4096 balances
# VPU op width against compile latency — override with CW_FUSED_BLOCK)
import os as _os

BLOCK = int(_os.environ.get("CW_FUSED_BLOCK", 4096))
_VMEM_LIMIT = 100 * 1024 * 1024


def _block_for(batch: int) -> int:
    return min(batch, BLOCK)


def _step_block(cfg: EnvConfig, state, action):
    """One env step for a block. Slot arrays are [B, 8]; per-env scalars are
    [B, 1] columns; ``action`` is int32[B, 1]. Mirrors core/slots._step_slots_one."""
    (slot_type, slot_pos_r, slot_pos_c, slot_stat, agent_r, agent_c,
     desired, achieved, init_type, init_pos_r, init_pos_c,
     init_agent_r, init_agent_c, step_num) = state

    i32 = jnp.int32
    # action deltas computed arithmetically (kernels can't capture host consts)
    dr = (action == C.ACTION_DOWN).astype(i32) - (action == C.ACTION_UP).astype(i32)
    dc = (action == C.ACTION_RIGHT).astype(i32) - (action == C.ACTION_LEFT).astype(i32)
    is_move = action < C.ACTION_PICKUP  # [B, 1] bool

    new_r = jnp.clip(agent_r + dr, 0, cfg.height - 1)
    new_c = jnp.clip(agent_c + dc, 0, cfg.width - 1)
    moved_pos = (new_r != agent_r) | (new_c != agent_c)

    on = slot_stat == ON_GRID  # [B, 8]
    held = slot_stat == HELD
    holding = jnp.sum(held * slot_type, axis=1, keepdims=True)  # [B, 1]

    at_here = on & (slot_pos_r == agent_r) & (slot_pos_c == agent_c)  # [B, 8]
    at_there = on & (slot_pos_r == new_r) & (slot_pos_c == new_c)
    obj_here = jnp.sum(at_here * slot_type, axis=1, keepdims=True)  # [B, 1]
    obj_there = jnp.sum(at_there * slot_type, axis=1, keepdims=True)

    blocked = ((obj_there == C.ROCK) & (holding != C.HOLD_HAMMER)) | (
        (obj_there == C.TREE) & (holding != C.HOLD_AXE)
    )
    move_ok = is_move & moved_pos & ~blocked  # [B, 1]

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
    eff_type = jnp.where((t == C.STICKS) & (holding == C.HOLD_HAMMER), C.HOUSE, eff_type)
    eff_type = jnp.where((t == C.WHEAT) & (holding == C.HOLD_AXE), C.BREAD, eff_type)
    eff_removed = (t == C.ROCK) | (t == C.BREAD)

    hit = at_there & move_ok  # [B, 8]
    slot_type = jnp.where(hit, eff_type, t)
    slot_stat = jnp.where(hit & eff_removed, REMOVED, slot_stat)

    slot_stat = jnp.where(can_pickup & at_here, HELD, slot_stat)
    dropping = can_drop & held
    slot_stat = jnp.where(dropping, ON_GRID, slot_stat)
    slot_pos_r = jnp.where(dropping, agent_r, slot_pos_r)
    slot_pos_c = jnp.where(dropping, agent_c, slot_pos_c)

    agent_r = jnp.where(move_ok, new_r, agent_r)
    agent_c = jnp.where(move_ok, new_c, agent_c)

    # ---- task evaluation (same boolean algebra as core/slots.py) ----
    eat = move_ok & (obj_there == C.BREAD)  # [B, 1]
    chop_rock = move_ok & (obj_there == C.ROCK)
    chop_tree = move_ok & (obj_there == C.TREE)
    make_bread = move_ok & (obj_there == C.WHEAT) & (holding == C.HOLD_AXE)
    build_house = move_ok & (obj_there == C.STICKS) & (holding == C.HOLD_HAMMER)

    a = achieved  # [B, 9] int32
    col = lambda k: a[:, k : k + 1]
    a_eat = col(C.T_EAT_BREAD) | eat
    a_crock = col(C.T_CHOP_ROCK) | chop_rock
    a_ctree = col(C.T_CHOP_TREE) | chop_tree
    a_mbread = col(C.T_MAKE_BREAD) | make_bread
    a_bhouse = col(C.T_BUILD_HOUSE) | build_house

    eff_there = jnp.sum(
        hit * jnp.where(eff_removed, 0, eff_type), axis=1, keepdims=True
    )
    cell_final = jnp.where(move_ok, eff_there, obj_here)
    a_house = (cell_final == C.HOUSE).astype(i32)

    at_init = (init_pos_r == agent_r) & (init_pos_c == agent_c)  # [B, 8]
    icode = jnp.sum(at_init * init_type, axis=1, keepdims=True)
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

    cols = [
        jnp.where(hold_axe, a_mbread, col(C.T_MAKE_BREAD)),       # 0
        a_eat,                                                    # 1
        jnp.where(hold_hammer, a_bhouse, col(C.T_BUILD_HOUSE)),   # 2
        a_ctree,                                                  # 3
        a_crock,                                                  # 4
        a_house,                                                  # 5
        jnp.where(hold_axe, ma, col(C.T_MOVE_AXE)),               # 6
        jnp.where(hold_hammer, mh, col(C.T_MOVE_HAMMER)),         # 7
        jnp.where(hold_sticks, ms, col(C.T_MOVE_STICKS)),         # 8
    ]
    upd = jnp.concatenate(cols, axis=1).astype(i32)  # [B, 9]
    achieved = jnp.where(is_move, upd, a)

    changed = move_ok | can_pickup | can_drop  # [B, 1]
    if cfg.reward_equal:
        success = jnp.all(achieved == desired, axis=1, keepdims=True)
    else:
        success = jnp.all(desired <= achieved, axis=1, keepdims=True)
    reward = jnp.where(changed & success, cfg.max_steps, -1).astype(i32)  # [B, 1]
    step_num = jnp.minimum(step_num + 1, cfg.max_steps)
    done = ((step_num >= cfg.max_steps) | (reward == cfg.max_steps)).astype(i32)

    new_state = (slot_type, slot_pos_r, slot_pos_c, slot_stat, agent_r, agent_c,
                 desired, achieved, init_type, init_pos_r, init_pos_c,
                 init_agent_r, init_agent_c, step_num)
    return new_state, reward, done


def _loop_and_store(cfg, num_steps, state, next_action, o_reward, o_done):
    """Shared T-step loop: rewards/dones land as [T, BLOCK] int32 rows."""

    def body(t, state):
        state, reward, done = _step_block(cfg, state, next_action(t))
        o_reward[t, :] = reward[:, 0]
        o_done[t, :] = done[:, 0]
        return state

    return jax.lax.fori_loop(0, num_steps, body, state)


def _read_state(refs):
    (st_ref, spr_ref, spc_ref, ss_ref, ar_ref, ac_ref,
     des_ref, ach_ref, it_ref, ipr_ref, ipc_ref,
     iar_ref, iac_ref, sn_ref) = refs
    return (st_ref[:], spr_ref[:], spc_ref[:], ss_ref[:], ar_ref[:], ac_ref[:],
            des_ref[:], ach_ref[:], it_ref[:], ipr_ref[:], ipc_ref[:],
            iar_ref[:], iac_ref[:], sn_ref[:])


def _write_state(state, outs):
    (o_st, o_spr, o_spc, o_ss, o_ar, o_ac, o_ach, o_sn) = outs
    (st, spr, spc, ss, ar, ac, _, ach, _, _, _, _, _, sn) = state
    o_st[:] = st
    o_spr[:] = spr
    o_spc[:] = spc
    o_ss[:] = ss
    o_ar[:] = ar
    o_ac[:] = ac
    o_ach[:] = ach
    o_sn[:] = sn


def _rollout_kernel(cfg, num_steps, block, seed_ref, *refs):
    in_refs, out_refs = refs[:14], refs[14:]
    blk = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + blk)
    state = _read_state(in_refs)

    def next_action(t):
        bits = pltpu.prng_random_bits((block, 1))
        return (bits % jnp.uint32(6)).astype(jnp.int32)

    state = _loop_and_store(cfg, num_steps, state, next_action,
                            out_refs[8], out_refs[9])
    _write_state(state, out_refs[:8])


def _actions_rollout_kernel(cfg, num_steps, act_ref, *refs):
    in_refs, out_refs = refs[:14], refs[14:]
    state = _read_state(in_refs)

    def next_action(t):
        return act_ref[t, :][:, None]

    state = _loop_and_store(cfg, num_steps, state, next_action,
                            out_refs[8], out_refs[9])
    _write_state(state, out_refs[:8])


def _specs(B, num_steps, extra_args, block):
    """BlockSpecs/shapes; index maps take (i, *extra) for scalar prefetch."""

    def vmem(shape, index_map):
        return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)

    def blk2(width):
        return vmem((block, width), lambda i, *a: (i, 0))

    def blkT():
        return vmem((num_steps, block), lambda i, *a: (0, i))

    in_specs = [
        blk2(8), blk2(8), blk2(8), blk2(8), blk2(1), blk2(1),
        blk2(9), blk2(9), blk2(8), blk2(8), blk2(8), blk2(1), blk2(1),
        blk2(1),
    ]
    out_specs = [
        blk2(8), blk2(8), blk2(8), blk2(8), blk2(1), blk2(1), blk2(9),
        blk2(1), blkT(), blkT(),
    ]
    sds = jax.ShapeDtypeStruct
    out_shape = [
        sds((B, 8), jnp.int32), sds((B, 8), jnp.int32), sds((B, 8), jnp.int32),
        sds((B, 8), jnp.int32), sds((B, 1), jnp.int32), sds((B, 1), jnp.int32),
        sds((B, 9), jnp.int32), sds((B, 1), jnp.int32),
        sds((num_steps, B), jnp.int32), sds((num_steps, B), jnp.int32),
    ]
    return in_specs, out_specs, out_shape, blkT


def _pack_inputs(slots: SlotState):
    i32 = lambda x: x.astype(jnp.int32)
    col = lambda x: x.astype(jnp.int32)[:, None]
    return [
        i32(slots.slot_type),
        i32(slots.slot_pos[..., 0]),
        i32(slots.slot_pos[..., 1]),
        i32(slots.slot_stat),
        col(slots.agent[:, 0]),
        col(slots.agent[:, 1]),
        i32(slots.desired),
        i32(slots.achieved),
        i32(slots.init_type),
        i32(slots.init_pos[..., 0]),
        i32(slots.init_pos[..., 1]),
        col(slots.init_agent[:, 0]),
        col(slots.init_agent[:, 1]),
        col(slots.step_num),
    ]


def _unpack_outputs(slots: SlotState, outs):
    (st, spr, spc, ss, ar, ac, ach, sn, rewards, dones) = outs
    new_slots = SlotState(
        slot_type=st,
        slot_pos=jnp.stack([spr, spc], axis=-1),
        slot_stat=ss,
        agent=jnp.concatenate([ar, ac], axis=1),
        desired=slots.desired,
        achieved=ach.astype(jnp.int8),
        init_type=slots.init_type,
        init_pos=slots.init_pos,
        init_agent=slots.init_agent,
        step_num=sn[:, 0],
        rng=slots.rng,
    )
    return new_slots, rewards, dones.astype(jnp.bool_)


@partial(jax.jit, static_argnums=0)
def fused_rollout_actions(cfg: EnvConfig, slots: SlotState, actions: jax.Array):
    """Fused rollout consuming an explicit ``actions int32[T, B]`` tensor."""
    T, B = actions.shape
    block = _block_for(B)
    assert B % block == 0, f"batch {B} must be a multiple of {block}"
    in_specs, out_specs, out_shape, blkT = _specs(B, T, extra_args=0, block=block)
    outs = pl.pallas_call(
        partial(_actions_rollout_kernel, cfg, T),
        grid=(B // block,),
        in_specs=[blkT()] + in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(actions.astype(jnp.int32), *_pack_inputs(slots))
    return _unpack_outputs(slots, outs)


@partial(jax.jit, static_argnums=(0, 3))
def fused_rollout(cfg: EnvConfig, slots: SlotState, seed, num_steps: int):
    """Run ``num_steps`` random-action steps entirely inside one Pallas kernel.

    Returns ``(new_slots, rewards int32[T, B], dones bool[T, B])``. Uses its
    own in-kernel action stream (seeded by ``seed``); per-step semantics are
    identical to the scan path (tested on matched action streams).
    """
    B = slots.agent.shape[0]
    block = _block_for(B)
    assert B % block == 0, f"batch {B} must be a multiple of {block}"
    in_specs, out_specs, out_shape, _ = _specs(B, num_steps, extra_args=1,
                                               block=block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // block,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        partial(_rollout_kernel, cfg, num_steps, block),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
    )(jnp.asarray([seed], jnp.int32), *_pack_inputs(slots))
    return _unpack_outputs(slots, outs)
