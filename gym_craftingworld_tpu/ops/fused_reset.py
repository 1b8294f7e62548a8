"""Fused Pallas world-pool generation: fresh PackedState batches in VMEM.

`train/fast_ppo.fresh_packed_batch` (the auto-reset pool source) costs
~4.4 ms per update at 32k worlds: the [n, 441] uniform score matrix
round-trips HBM and `jax.lax.top_k` lowers to a partial sort over all 441
lanes. This kernel keeps the whole placement draw in VMEM and transposed —
**cells on sublanes, envs on lanes** — so every pick is a cheap
sublane-axis reduction over (8, 128) tiles instead of a lane-axis scan:

  * scores come from the in-kernel TPU PRNG (no HBM input at all);
  * the ordered 9-of-441 subset is taken by 9 (max, first-index, mask)
    passes — iterative argmax of iid scores is *distribution-identical* to
    the reference's shuffle-take-9 (craftingworld_ray.py:599-628, the same
    argument as core/reset.sample_world's top-k: each next pick is uniform
    over the remaining cells);
  * the task draw (craftingworld_ray.py:169-176: k = randint(9)+1 bits via
    shuffle) is the same machinery over 9 score sublanes: the first k
    argmax picks are a uniform ordered k-subset.

Ties: picks compare 31-bit random keys, so a tie costs ~441²/2³¹ ≈ 9e-5 per
world (broken towards the lower cell index) — below the f32-uniform tie rate
of the XLA path it replaces. Outputs are the raw per-env columns; the public
wrapper assembles the same PackedState `fresh_packed_batch` returns.
Distribution is validated on-chip (tests_tpu/test_fused_reset_tpu.py);
structural invariants (distinct cells, mask ranges) in interpret mode.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.ops.packed_rollout import PackedState

i16 = jnp.int16
i32 = jnp.int32

BLOCK = 1024  # worlds per grid step, processed as 8 lane-groups of 128
_LANES = 128
_GROUPS = BLOCK // _LANES


def _pad8(n: int) -> int:
    return -(-n // 8) * 8


def _take_picks(scores, rows, picks):
    """`picks` iterations of (max over sublanes, first row index, mask).

    ``scores`` int32[R, 128] (>=0 valid, -1 padding), ``rows`` iota over
    axis 0. Returns list of int32[128] picks.
    """
    out = []
    for _ in range(picks):
        m = jnp.max(scores, axis=0)  # [128]
        a = jnp.min(
            jnp.where(scores == m[None, :], rows, i32(2**30)), axis=0
        )  # [128] first row attaining the max
        out.append(a)
        scores = jnp.where(rows == a[None, :], i32(-1), scores)
    return out


def _kernel(cfg: EnvConfig, seed_ref, *out_refs):
    HW = cfg.n_cells
    HWp = _pad8(HW)
    # Two seed words: the block index perturbs the first, the second extends
    # the stream space to ~62 bits — with a single 31-bit word, block-seed
    # ranges (seed + i) from different updates collide after ~10^4 updates
    # (expected hundreds of duplicated 1024-world blocks per 100k updates at
    # n=32k), mildly violating the iid pool contract.
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0), seed_ref[1])

    for g in range(_GROUPS):
        sl = pl.ds(g * _LANES, _LANES)

        # ---- placement: ordered 9-of-HW subset (cells on sublanes) ----
        bits = pltpu.prng_random_bits((HWp, _LANES))
        keys = (pltpu.bitcast(bits, jnp.uint32) >> jnp.uint32(1)).astype(i32)
        rows = jax.lax.broadcasted_iota(i32, keys.shape, 0)
        keys = jnp.where(rows < HW, keys, i32(-1))
        picks = _take_picks(keys, rows, C.N_OBJECTS + 1)

        # ---- task draw (craftingworld_ray.py:169-176 semantics):
        # k = randint(number_of_tasks)+1 when stacking else 1, tasks a
        # uniform ordered k-subset of cfg.selected_task_indices ----
        sel = cfg.selected_task_indices
        tbits = pltpu.prng_random_bits((16, _LANES))
        tkeys = (pltpu.bitcast(tbits, jnp.uint32) >> jnp.uint32(1)).astype(i32)
        trows = jax.lax.broadcasted_iota(i32, tkeys.shape, 0)
        valid = jnp.zeros(trows.shape, jnp.bool_)
        for t in sel:  # static, <= 9 rows
            valid = valid | (trows == t)
        tscores = jnp.where(valid, tkeys, i32(-1))
        if cfg.stacking:
            kdraw = jnp.sum(
                jnp.where(trows == C.N_TASKS, tkeys, 0), axis=0
            ) % i32(cfg.number_of_tasks) + 1  # [128] (modulo bias ~4e-9)
        else:
            kdraw = jnp.ones((_LANES,), i32)
        task_picks = _take_picks(tscores, trows, len(sel))
        desired = jnp.zeros((_LANES,), i32)
        for t, a in enumerate(task_picks):
            desired = desired | jnp.where(t < kdraw, i32(1) << a, 0)

        for r, v in zip(out_refs[: C.N_OBJECTS + 1], picks):
            r[sl] = v
        out_refs[C.N_OBJECTS + 1][sl] = desired


@partial(jax.jit, static_argnums=(0, 2), static_argnames=("interpret",))
def fresh_packed_fused(cfg: EnvConfig, seed, n: int, *, seed2=0,
                       interpret: bool = False) -> PackedState:
    """`fresh_packed_batch` semantics from the in-kernel TPU PRNG.

    Same state distribution (uniform one-of-each placement + reference task
    draw); different bitstream (seeded per block, like the bench kernel).
    ``seed2`` is a second independent seed word: callers drawing pools every
    update (train/fast_ppo._fresh_pool) pass two fresh 31-bit words so block
    streams are disjoint across updates (see _kernel).
    """
    if n % BLOCK:
        raise ValueError(f"n ({n}) must be a multiple of {BLOCK}")
    grid = (n // BLOCK,)
    row = lambda: pl.BlockSpec((BLOCK,), lambda b, *a: (b,))
    n_out = C.N_OBJECTS + 2  # 8 slots + agent + desired
    outs = pl.pallas_call(
        partial(_kernel, cfg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[],
            out_specs=[row() for _ in range(n_out)],
        ),
        out_shape=[jax.ShapeDtypeStruct((n,), i32) for _ in range(n_out)],
        interpret=(pltpu.InterpretParams() if interpret else False),
    )(jnp.stack([jnp.asarray(seed, i32), jnp.asarray(seed2, i32)]))
    slot_key = jnp.stack(outs[: C.N_OBJECTS]).astype(i16)  # [8, n]
    agent_key = outs[C.N_OBJECTS].astype(i16)
    desired = outs[C.N_OBJECTS + 1].astype(i16)
    types = jnp.broadcast_to(
        jnp.arange(1, C.N_OBJECTS + 1, dtype=i16)[:, None], (C.N_OBJECTS, n)
    )
    zeros = jnp.zeros((n,), i16)
    W = i16(cfg.width)
    return PackedState(
        slot_key=slot_key,
        slot_type=types,
        init_key=slot_key,
        init_type=types,
        agent_r=agent_key // W,
        agent_c=agent_key % W,
        holding=zeros,
        obj_here=zeros,
        icode_here=jnp.full((n,), C.AGENT_INIT_MARK, i16),
        achieved=zeros,
        desired=desired,
        init_agent_key=agent_key,
        step_num=zeros,
    )
