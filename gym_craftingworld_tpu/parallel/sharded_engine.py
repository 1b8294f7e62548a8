"""Mesh sharding for the throughput engines (packed scan + fused kernel).

The slot/packed layouts put the env batch on the *last* axis ([8, B] slot
arrays, [B] scalars) so that batch fills VPU lanes — which means the sharding
story differs from the grid path's leading-axis ``P('env')``:

* ``SlotState`` leaves are batch-leading → ``P('env')`` (same as EnvState);
  inside ``rollout_p`` the transpose to [8, B] propagates to ``P(None,'env')``
  automatically, and stepping remains communication-free (bit-exactness under
  sharding is pinned by tests/test_sharded_engine.py).
* The fused Pallas kernel is wrapped in ``shard_map``: each device runs the
  kernel over its local batch shard, with per-shard seeds laid out so that
  global block ``j`` draws the *same* PRNG stream as the single-device kernel
  (shard ``i`` covers blocks ``i*nlb .. (i+1)*nlb-1`` and seeds them
  ``seed + i*nlb + k`` — exactly the unsharded ``seed + program_id`` layout).
  The only collective is one scalar ``psum`` for the reward checksum.

Scaling is embarrassingly parallel: no cross-chip bytes move during stepping,
so env-steps/s is linear in devices by construction (the reference has no
parallelism at all — craftingworld_ray.py steps one env per process).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.slots import SlotState
from gym_craftingworld_tpu.ops import packed_fused as pf
from gym_craftingworld_tpu.ops.packed_rollout import rollout_p
from gym_craftingworld_tpu.parallel.mesh import ENV_AXIS, env_sharding


def shard_slots(slots: SlotState, mesh: Mesh) -> SlotState:
    """Lay a SlotState batch out over the mesh (all leaves batch-leading)."""
    s = env_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), slots)


def packed_lane_sharding(mesh: Mesh):
    """Per-field shardings for a PackedState batch (batch on the LAST axis).

    Slot arrays are [8, B] → ``P(None, 'env')``; per-env scalars [B] →
    ``P('env')``.
    """
    from gym_craftingworld_tpu.ops.packed_fused import _SLOT_FIELDS
    from gym_craftingworld_tpu.ops.packed_rollout import PackedState

    return PackedState(**{
        f: NamedSharding(
            mesh, P(None, ENV_AXIS) if f in _SLOT_FIELDS else P(ENV_AXIS)
        )
        for f in PackedState._fields
    })


def shard_packed(env, mesh: Mesh):
    """Lay a PackedState batch out over the mesh (lane-axis sharding)."""
    return jax.tree.map(jax.device_put, env, packed_lane_sharding(mesh))


def fast_train_step_sharded(cfg: EnvConfig, fppo, mesh: Mesh):
    """train/fast_ppo.train_step_fast with output shardings pinned.

    Same rationale as ``parallel.mesh.ppo_train_step_sharded``: the env
    batch's lane-axis sharding must survive the step regardless of what the
    partitioner would choose. Returns ``step(ts, env, key)``.

    The fused Pallas reset pool AND the fused update kernel are forced off
    on a >1-device mesh: both raw pallas_calls are not shard_map-wrapped
    inside train_step_fast, so the partitioner would either reject them or
    silently replicate their operands per device. The jax.random pool and
    the autodiff update partition cleanly; the shard_map-wrapped per-device
    form of the update kernel (grads + psum) is exercised separately in the
    multichip dryrun (__graft_entry__.py).
    """
    from gym_craftingworld_tpu.train.fast_ppo import train_step_fast

    fused_pool = None if mesh.size == 1 else False
    rep = NamedSharding(mesh, P())
    return jax.jit(
        partial(train_step_fast, cfg, fppo, fused_pool=fused_pool,
                fused_update=fused_pool),
        donate_argnums=(0,),
        out_shardings=(rep, packed_lane_sharding(mesh), rep, rep),
    )


def pixel_train_step_sharded(cfg: EnvConfig, pppo, mesh: Mesh):
    """train/fast_pixel_ppo.train_step_pixel with output shardings pinned."""
    from gym_craftingworld_tpu.train.fast_pixel_ppo import train_step_pixel

    rep = NamedSharding(mesh, P())
    return jax.jit(
        partial(train_step_pixel, cfg, pppo),
        donate_argnums=(0,),
        out_shardings=(rep, packed_lane_sharding(mesh), rep, rep),
    )


def rollout_p_sharded(cfg: EnvConfig, slots: SlotState, actions,
                      num_steps: int, mesh: Mesh):
    """Packed scan rollout over a sharded batch.

    ``actions`` is int[T, B]; it is constrained to ``P(None, 'env')`` so each
    device steps only its local envs. Results are bit-identical to the
    single-device rollout (same per-env algebra, no collectives).
    """
    actions = jax.lax.with_sharding_constraint(
        actions, NamedSharding(mesh, P(None, ENV_AXIS))
    )
    return rollout_p(cfg, slots, actions, num_steps)


@partial(jax.jit, static_argnums=(0, 3),
         static_argnames=("mesh", "interpret", "block"))
def fused_rollout_packed_sharded(cfg: EnvConfig, slots: SlotState, actions,
                                 num_steps: int, *, mesh: Mesh,
                                 interpret: bool = False,
                                 block: int | None = None):
    """shard_map the fused actions-kernel: each device runs its local blocks."""

    def local(slots_l, actions_l):
        return pf.fused_rollout_packed(cfg, slots_l, actions_l, num_steps,
                                       interpret=interpret, block=block)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ENV_AXIS), P(None, ENV_AXIS)),
        out_specs=(P(ENV_AXIS), P(None, ENV_AXIS), P(None, ENV_AXIS)),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )(slots, actions)


@partial(jax.jit, static_argnums=(0, 3),
         static_argnames=("mesh", "interpret", "block"))
def fused_rollout_packed_bench_sharded(cfg: EnvConfig, slots: SlotState, seed,
                                       num_steps: int, *, mesh: Mesh,
                                       interpret: bool = False,
                                       block: int | None = None):
    """shard_map the fused bench kernel (in-kernel PRNG actions).

    Per-shard seeds reproduce the single-device block-seed layout, so the
    global action streams — and therefore the reward checksum — are identical
    to ``fused_rollout_packed_bench`` on one device with the same global B.
    """
    B = slots.agent.shape[0]
    local_B = B // mesh.size
    nlb = local_B // pf._block_size(local_B, block)  # blocks per shard

    def local(slots_l, seed_arr):
        shard = jax.lax.axis_index(ENV_AXIS)
        st, acc = pf.fused_rollout_packed_bench(
            cfg, slots_l, seed_arr[0] + shard * nlb, num_steps,
            interpret=interpret, block=block,
        )
        return st, jax.lax.psum(acc, ENV_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ENV_AXIS), P()),
        out_specs=(P(ENV_AXIS), P()),
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )(slots, jnp.asarray([seed], jnp.int32))
