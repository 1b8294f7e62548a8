"""PPO over the packed-key engine — the throughput training path.

The reference-parity PPO (train/ppo.py) steps the grid engine and runs a full
fresh reset (including goal imagination) for *every* env *every* step of the
rollout scan; it tops out near ~10^5 env-steps/s. This trainer redesigns the
loop around what the TPU is fast at:

* **Engine**: rollouts step ``ops/packed_rollout._step_p_unrolled`` — the
  slot-unrolled packed int16
  slot engine behind the headline benchmark — inside the collect scan. Policy
  inference runs in the same transposed layout: features are built as
  ``[F, B]`` (features on sublanes, batch on lanes) and every matmul is
  ``W[h, F] @ feat[F, B]`` with bf16 inputs and fp32 accumulation, so the
  batch axis always fills the 128-lane dimension of the MXU.

* **Two-phase auto-reset**: finished envs pull a fresh world from an
  on-device pool of 2B pre-placed states — a contiguous slice through a
  per-step rotating window (a random per-env gather would serialise on the
  lane axis) — and the pool itself is regenerated from the step key once per
  update, outside the scan. Placement
  uses the same ordered-top-k-of-iid-uniforms trick as core/reset.sample_world
  (provably the reference's sample_state distribution,
  craftingworld_ray.py:599-628), and tasks are drawn per pool entry with
  core/reset.sample_desired (:169-176). Pulling pre-generated worlds at reset
  is the reference's own ``fixed_init_state`` semantics (:630-644) — with the
  pool refreshed every update, so worlds do not repeat across updates. Goal
  *images* are never materialised: the slot policy conditions on the desired
  task bits directly, which carry strictly more information than the rendered
  goal (render/raster.py reconstructs the image from exactly these bits plus
  the init state).

* **Storage**: rollouts store the bf16 feature matrix itself (``[T, F, B]``,
  ~124 MB at 16k envs x 64 steps) rather than observations — the same tensor
  the update consumes, so minibatching is a pure column gather and the policy
  sees bit-identical inputs in collect and update.

Measured on v5e (16k envs, 21x21, rollout_steps=64): ~30.5 ms/update =
3.44e7 env-steps/s through the full PPO loop at the default config (collect
alone ~1.7e8; the 1-epoch ``throughput()`` preset reaches 7.71e7), ~340x the
reference-parity path; absolute 64-update timing via train_many_fast
(tools/fast_ppo_bench.py). Current numbers live in docs/benchmarks.md.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.reset import sample_desired
from gym_craftingworld_tpu.ops.packed_rollout import (
    PackedState,
    _step_p_unrolled,
)

i16 = jnp.int16
bf16 = jnp.bfloat16
_BITS9 = np.arange(9, dtype=np.int32)


class FastPPOConfig(NamedTuple):
    rollout_steps: int = 64
    update_epochs: int = 2
    num_minibatches: int = 8
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    hidden: int = 512

    @classmethod
    def throughput(cls, **overrides) -> "FastPPOConfig":
        """The swept wall-clock-optimal preset: 1 epoch, hidden 384.

        ~2.2x the default's env-steps/s (7.71e7 vs 3.44e7 at 16k envs on
        v5e) at the SAME wall-clock learning on the sweep benchmark (tail
        success/step 0.0099 vs 0.0101 — within seed noise; the default wins
        per *env-step*, i.e. when samples are the scarce resource). Curves
        for both accountings: docs/fast_ppo_sweep.json. The default config's
        update phase is genuinely FLOP-dominated now (its fused kernel runs
        at 89% of the useful-FLOP roofline — docs/benchmarks.md), so
        reduced-epoch presets remain how the loop goes materially faster.
        """
        return cls(update_epochs=1, hidden=384)._replace(**overrides)


# ---------------------------------------------------------------------------
# fresh worlds, directly in the packed layout
# ---------------------------------------------------------------------------


def fresh_packed_batch(cfg: EnvConfig, key: jax.Array, n: int) -> PackedState:
    """Sample ``n`` freshly-reset worlds straight into PackedState columns.

    Equivalent in distribution to reset() minus the goal image: one of each
    of the 8 objects + the agent on distinct uniform cells (ordered top-k of
    iid uniforms == the reference's diag-shuffle, craftingworld_ray.py:605-613)
    and a task mask from sample_desired (:169-176). The agent's spawn cell
    holds no object, so obj_here=0 and icode_here=AGENT_INIT_MARK exactly.
    """
    k_place, k_task = jax.random.split(key)
    scores = jax.random.uniform(k_place, (n, cfg.n_cells))
    _, idx = jax.lax.top_k(scores, C.N_OBJECTS + 1)  # [n, 9] distinct cells
    slot_key = idx[:, : C.N_OBJECTS].T.astype(i16)  # [8, n]
    agent_key = idx[:, C.N_OBJECTS].astype(i16)  # [n]
    types = jnp.broadcast_to(
        jnp.arange(1, C.N_OBJECTS + 1, dtype=i16)[:, None], (C.N_OBJECTS, n)
    )
    desired_rows = jax.vmap(partial(sample_desired, cfg))(
        jax.random.split(k_task, n)
    )  # [n, 9] int8
    desired = jnp.sum(
        desired_rows.astype(jnp.int32) << _BITS9[None, :], axis=1
    ).astype(i16)
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


def _pool_take(pool: PackedState, idx: jax.Array) -> PackedState:
    """Gather pool columns ``idx`` int[B] → a PackedState batch of B."""
    return jax.tree.map(lambda x: x[..., idx], pool)


def _pool_slice(pool: PackedState, off, B: int) -> PackedState:
    """Contiguous B-column window of the pool starting at ``off``.

    A random per-env gather of pool columns is a minor-axis gather the TPU
    serialises (~the same pathology as per-sample minibatch shuffling); a
    dynamic slice moves the same bytes in one contiguous copy. The window
    offset rotates by an odd stride per step, so an env resetting at two
    different steps draws two different worlds, and two envs never share a
    world within a step. Pool entries are iid, so which entry an env gets
    carries no information.
    """
    return jax.tree.map(
        lambda x: jax.lax.dynamic_slice_in_dim(x, off, B, axis=x.ndim - 1),
        pool,
    )


def _autoreset(state: PackedState, fresh: PackedState, done) -> PackedState:
    return jax.tree.map(lambda f, s: jnp.where(done, f, s), fresh, state)


# ---------------------------------------------------------------------------
# policy: feature-major MLP (params fp32, matmuls bf16 -> fp32)
# ---------------------------------------------------------------------------


def feature_rows(cfg: EnvConfig) -> int:
    return 5 * C.N_OBJECTS + 27


def features(cfg: EnvConfig, s: PackedState) -> jax.Array:
    """Packed state → bf16[F, B] policy features (batch stays on lanes)."""
    HW = cfg.height * cfg.width
    key = s.slot_key.astype(jnp.int32)  # [8, B]
    on = key < HW
    held = key == HW
    r = jnp.where(on, key // cfg.width, 0)
    c = jnp.where(on, key % cfg.width, 0)
    f = bf16
    hold = s.holding.astype(jnp.int32)
    des = s.desired.astype(jnp.int32)
    ach = s.achieved.astype(jnp.int32)
    rows = [
        s.slot_type.astype(f) * f(1 / 8),  # 8
        r.astype(f) * f(1 / cfg.height),  # 8
        c.astype(f) * f(1 / cfg.width),  # 8
        on.astype(f),  # 8
        held.astype(f),  # 8
        s.agent_r.astype(f)[None] * f(1 / cfg.height),  # 1
        s.agent_c.astype(f)[None] * f(1 / cfg.width),  # 1
        jnp.stack([(hold == h).astype(f) for h in range(4)]),  # 4
        ((des[None, :] >> _BITS9[:, None]) & 1).astype(f),  # 9
        ((ach[None, :] >> _BITS9[:, None]) & 1).astype(f),  # 9
        s.obj_here.astype(f)[None] * f(1 / 8),  # 1
        s.icode_here.astype(f)[None] * f(1 / 10),  # 1
        s.step_num.astype(f)[None] * f(1 / cfg.max_steps),  # 1
    ]
    return jnp.concatenate(rows, axis=0)  # [F, B]


class MLPParams(NamedTuple):
    w1: jax.Array  # [H, F]
    b1: jax.Array  # [H]
    w2: jax.Array  # [H, H]
    b2: jax.Array  # [H]
    wl: jax.Array  # [6, H]
    bl: jax.Array  # [6]
    wv: jax.Array  # [1, H]
    bv: jax.Array  # [1]


def init_params(key, cfg: EnvConfig, fppo: FastPPOConfig) -> MLPParams:
    F, H = feature_rows(cfg), fppo.hidden
    k1, k2, k3, k4 = jax.random.split(key, 4)
    he = lambda k, shp, fan: jax.random.normal(k, shp) * np.sqrt(2.0 / fan)
    return MLPParams(
        w1=he(k1, (H, F), F),
        b1=jnp.zeros((H,)),
        w2=he(k2, (H, H), H),
        b2=jnp.zeros((H,)),
        wl=0.01 * he(k3, (C.N_ACTIONS, H), H),
        bl=jnp.zeros((C.N_ACTIONS,)),
        wv=he(k4, (1, H), H),
        bv=jnp.zeros((1,)),
    )


def _mm(w, x):
    """bf16 matmul, fp32 accumulation: [h, F] @ [F, B] -> f32[h, B]."""
    return jax.lax.dot_general(
        w.astype(bf16), x.astype(bf16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def apply_policy(p: MLPParams, feat: jax.Array):
    """feat [F, B] → (logits f32[6, B], value f32[B])."""
    h = jax.nn.relu(_mm(p.w1, feat) + p.b1[:, None])
    h = jax.nn.relu(_mm(p.w2, h) + p.b2[:, None])
    logits = _mm(p.wl, h) + p.bl[:, None]
    value = (_mm(p.wv, h) + p.bv[:, None])[0]
    return logits, value


# ---------------------------------------------------------------------------
# the training step
# ---------------------------------------------------------------------------


class FastTrainState(NamedTuple):
    params: MLPParams
    opt_state: optax.OptState
    update_idx: jax.Array


class _Traj(NamedTuple):
    feat: jax.Array  # bf16[T, F, B]
    action: jax.Array  # int32[T, B]
    log_prob: jax.Array  # f32[T, B]
    value: jax.Array  # f32[T, B]
    reward: jax.Array  # f32[T, B]
    done: jax.Array  # bool[T, B]
    raw_reward: jax.Array  # int32[T, B] (reference-scale, for metrics)


def _fu():
    """Lazy import of ops.fused_update (it imports this module's types)."""
    from gym_craftingworld_tpu.ops import fused_update

    return fused_update


def make_optimizer(fppo: FastPPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(fppo.max_grad_norm),
        optax.adam(fppo.lr),
    )


def init_fast_train_state(key, cfg: EnvConfig,
                          fppo: FastPPOConfig) -> FastTrainState:
    params = init_params(key, cfg, fppo)
    return FastTrainState(
        params=params,
        opt_state=make_optimizer(fppo).init(params),
        update_idx=jnp.int32(0),
    )


def _sample_action(key, logits):
    """Gumbel-argmax over the action axis (axis 0); returns (action, log_prob)."""
    u = jax.random.uniform(key, logits.shape, minval=1e-7, maxval=1.0)
    g = logits - jnp.log(-jnp.log(u))
    action = jnp.argmax(g, axis=0).astype(jnp.int32)  # [B]
    logsm = jax.nn.log_softmax(logits, axis=0)
    onehot = (jnp.arange(logits.shape[0])[:, None] == action[None, :])
    log_prob = jnp.sum(onehot * logsm, axis=0)
    return action, log_prob


def _collect(cfg: EnvConfig, fppo: FastPPOConfig, params: MLPParams,
             env: PackedState, pool: PackedState, key):
    B = env.agent_r.shape[-1]

    def body(carry, inp):
        st = carry
        k_act, t = inp
        feat = features(cfg, st)
        logits, value = apply_policy(params, feat)
        action, log_prob = _sample_action(k_act, logits)
        st2, res = _step_p_unrolled(cfg, st, action.astype(i16))
        reward = jnp.where(
            res.reward == cfg.max_steps, 1.0, -1.0 / cfg.max_steps
        ).astype(jnp.float32)
        off = (t * jnp.int32(12007)) % jnp.int32(B)  # odd stride, full period
        st2 = _autoreset(st2, _pool_slice(pool, off, B), res.done)
        tr = _Traj(feat=feat, action=action, log_prob=log_prob, value=value,
                   reward=reward, done=res.done, raw_reward=res.reward)
        return st2, tr

    keys = jax.random.split(key, fppo.rollout_steps)
    steps = jnp.arange(fppo.rollout_steps, dtype=jnp.int32)
    return jax.lax.scan(body, env, (keys, steps))


def _gae(fppo: FastPPOConfig, traj: _Traj, last_value):
    def body(carry, tr):
        gae, next_value = carry
        not_done = 1.0 - tr.done.astype(jnp.float32)
        delta = tr.reward + fppo.gamma * next_value * not_done - tr.value
        gae = delta + fppo.gamma * fppo.gae_lambda * not_done * gae
        return (gae, tr.value), gae

    (_, _), adv = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
    )
    return adv, adv + traj.value


def _mm_bm(x, w):
    """Batch-major bf16 matmul: x[N, K] contracted with w[H, K] -> f32[N, H].

    The update phase runs batch-major while the collect runs feature-major:
    with batch on lanes ([F, B]) the *forward* fills the MXU, but every
    weight gradient then contracts over the minor lane axis, which XLA
    lowers through full activation transposes — before this re-layout the
    wgrads alone consumed ~85% of the update's wall time at 16k envs, ~13%
    MXU efficiency on the backward. Batch-major activations give the
    standard wgrad lowering (contraction over the major axis) at identical
    math.
    """
    return jax.lax.dot_general(
        x.astype(bf16), w.astype(bf16),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def apply_policy_bm(p: MLPParams, feat: jax.Array):
    """feat [N, F] → (logits f32[6, N], value f32[N]); same math as
    :func:`apply_policy`.

    Hybrid layout: the trunk is batch-major (efficient weight gradients),
    stored bf16 (every consumer casts to bf16 anyway, so only the residuals'
    storage precision changes — and halving that traffic matters: the update
    is HBM-bound, not MXU-bound). The heads come out feature-major [6, N] /
    [1, N] so the loss's elementwise chains run on full 128-lane tiles — a
    [N, 6] f32 layout puts the 6 actions on lanes and wastes 122 of 128.
    """
    # Cast the *pre-activation* to bf16: the f32 matmul accumulator then
    # lives only inside the fusion, so the stored residual and every big
    # backward cotangent are bf16 — per-op profiling showed the f32
    # [131072, 512] residuals re-streaming ~45 GB/update through HBM at 84%
    # bandwidth utilization, 3x the update's entire useful traffic.
    h = jax.nn.relu((_mm_bm(feat, p.w1) + p.b1[None, :]).astype(bf16))
    h = jax.nn.relu((_mm_bm(h, p.w2) + p.b2[None, :]).astype(bf16))
    # [6, H] x [N, H] -> [6, N]: contraction over H, no transpose of h
    logits = jax.lax.dot_general(
        p.wl.astype(bf16), h, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + p.bl[:, None]
    value = (
        jax.lax.dot_general(
            p.wv.astype(bf16), h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + p.bv[:, None]
    )[0]
    return logits, value


def _loss(fppo: FastPPOConfig, params: MLPParams, batch):
    feat, action, old_log_prob, old_value, adv, ret = batch
    logits, value = apply_policy(params, feat)  # feat [F, M]
    logsm = jax.nn.log_softmax(logits, axis=0)
    onehot = (jnp.arange(logits.shape[0])[:, None] == action[None, :])
    log_prob = jnp.sum(onehot * logsm, axis=0)
    ratio = jnp.exp(log_prob - old_log_prob)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg = -jnp.minimum(
        ratio * adv_n,
        jnp.clip(ratio, 1 - fppo.clip_eps, 1 + fppo.clip_eps) * adv_n,
    ).mean()
    v_clipped = old_value + jnp.clip(
        value - old_value, -fppo.clip_eps, fppo.clip_eps
    )
    v_loss = 0.5 * jnp.maximum(
        (value - ret) ** 2, (v_clipped - ret) ** 2
    ).mean()
    entropy = -(jnp.exp(logsm) * logsm).sum(0).mean()
    loss = pg + fppo.vf_coef * v_loss - fppo.ent_coef * entropy
    return loss, {"pg_loss": pg, "v_loss": v_loss, "entropy": entropy}


def _loss_bm(fppo: FastPPOConfig, params: MLPParams, batch):
    """Batch-major-trunk clipped-surrogate loss; same math as :func:`_loss`."""
    feat, action, old_log_prob, old_value, adv, ret = batch  # feat [N, F]
    logits, value = apply_policy_bm(params, feat)  # logits [6, N]
    logsm = jax.nn.log_softmax(logits, axis=0)
    onehot = (jnp.arange(logits.shape[0])[:, None] == action[None, :])
    log_prob = jnp.sum(onehot * logsm, axis=0)
    ratio = jnp.exp(log_prob - old_log_prob)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg = -jnp.minimum(
        ratio * adv_n,
        jnp.clip(ratio, 1 - fppo.clip_eps, 1 + fppo.clip_eps) * adv_n,
    ).mean()
    v_clipped = old_value + jnp.clip(
        value - old_value, -fppo.clip_eps, fppo.clip_eps
    )
    v_loss = 0.5 * jnp.maximum(
        (value - ret) ** 2, (v_clipped - ret) ** 2
    ).mean()
    entropy = -(jnp.exp(logsm) * logsm).sum(0).mean()
    loss = pg + fppo.vf_coef * v_loss - fppo.ent_coef * entropy
    return loss, {"pg_loss": pg, "v_loss": v_loss, "entropy": entropy}


def shuffle_block(T: int, B: int, num_minibatches: int) -> int:
    """Shuffle-block rows: the largest power-of-two multiple of 128 (≤ 2048)
    that tiles every minibatch AND leaves ≥ 8 blocks per minibatch, so each
    minibatch mixes independently drawn (timestep, env) slabs rather than
    collapsing into 1-2 contiguous tiles at small T*B. At the default config
    (131k rows/minibatch) this still returns 2048 — the fused kernel's best
    row tile, where one shuffle block = one kernel grid step and the permuted
    block DMA sequence IS the shuffle
    (ops/fused_update.fused_minibatch_grads_indexed). Tiny minibatches that
    can't fit 8 blocks get the smallest tiling block (most mixing available).
    """
    rows_mb = (T * B) // num_minibatches
    cands = [blk for blk in (2048, 1024, 512, 256, 128) if rows_mb % blk == 0]
    if not cands:
        raise ValueError(
            f"rollout_steps*batch/num_minibatches ({rows_mb}) must be a "
            f"multiple of 128 for block-shuffled minibatching"
        )
    for blk in cands:
        if blk * 8 <= rows_mb:
            return blk
    return cands[-1]


def _update_phase(fppo: FastPPOConfig, ts: FastTrainState, traj: "_Traj",
                  adv, ret, k_perm, use_fused_kernel: bool | None = None):
    """GAE-to-optimizer tail of one PPO iteration (shared with the profiler).

    Shuffle blocks are (timestep, env-span) tiles of :func:`shuffle_block`
    rows (2048 at production shapes — one fused-kernel grid step each). With
    envs iid and blocks drawn across all timesteps, minibatch mixing is
    preserved as long as each minibatch receives several independently drawn
    blocks — :func:`shuffle_block` guarantees ≥ 8 whenever the shapes allow.
    The coarser-than-128 width exists so the fused kernel can pull each
    permuted block straight from the un-shuffled feature slab (no per-epoch
    gather, no per-minibatch slice copies).

    ``use_fused_kernel`` selects the fused Pallas gradient kernel
    (ops/fused_update.py) over autodiff of :func:`_loss_bm`. Default: on
    whenever running on TPU. The kernel is the same math (gradient parity
    pinned by tests/test_fused_update.py); it exists because the autodiff
    schedule is HBM-bound (see the kernel's docstring).
    """
    T, B = traj.action.shape
    F = traj.feat.shape[1]
    BLK = shuffle_block(T, B, fppo.num_minibatches)
    NB = (T * B) // BLK
    if use_fused_kernel is None:
        use_fused_kernel = jax.devices()[0].platform == "tpu"
    featb = jnp.transpose(traj.feat, (0, 2, 1)).reshape(NB, BLK, F)
    blk = lambda x: x.reshape(NB, BLK)
    vecs = (
        blk(traj.action),
        blk(traj.log_prob),
        blk(traj.value),
        blk(adv),
        blk(ret),
    )
    optimizer = make_optimizer(fppo)
    nbm = NB // fppo.num_minibatches
    mb = nbm * BLK

    def epoch(carry, k_e):
        params, opt_state = carry
        perm = jax.random.permutation(k_e, NB)

        def minibatch(carry, i):
            params, opt_state = carry
            ids = jax.lax.dynamic_slice_in_dim(perm, i * nbm, nbm)
            # the five per-row vectors are ~1% of the bytes: gather them in
            # XLA; the feature slab is gathered by the kernel's index map
            rest = tuple(x[ids].reshape(mb) for x in vecs)
            if use_fused_kernel:
                grads, aux = _fu().fused_minibatch_grads_indexed(
                    fppo, params, featb, ids, rest
                )
                loss = aux.pop("loss")
            else:
                batch = (featb[ids].reshape(mb, F),) + rest
                (loss, aux), grads = jax.value_and_grad(
                    lambda p: _loss_bm(fppo, p, batch), has_aux=True
                )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, aux)

        return jax.lax.scan(
            minibatch, (params, opt_state), jnp.arange(fppo.num_minibatches)
        )

    (params, opt_state), (losses, auxes) = jax.lax.scan(
        epoch, (ts.params, ts.opt_state),
        jax.random.split(k_perm, fppo.update_epochs),
    )
    return params, opt_state, losses, auxes


def _fresh_pool(cfg: EnvConfig, key, n: int,
                fused: bool | None = None) -> PackedState:
    """Auto-reset pool: the fused in-VMEM generator on TPU (same world/task
    distribution, in-kernel PRNG — ops/fused_reset.py), the jax.random path
    elsewhere. The pool's only contract is iid reference-distribution worlds.

    ``fused=False`` forces the jax.random path: the pallas_call is not
    shard_map-wrapped, so under a multi-device mesh jit it would risk a
    partitioner error or silent pool replication — the sharded wrapper
    (parallel/sharded_engine.fast_train_step_sharded) passes False.
    Two fresh seed words per pool keep block PRNG streams disjoint across
    updates (fused_reset._kernel).
    """
    if fused is None:
        fused = jax.devices()[0].platform == "tpu"
    if fused:
        from gym_craftingworld_tpu.ops.fused_reset import BLOCK, fresh_packed_fused

        if n % BLOCK == 0:
            seeds = jax.random.randint(key, (2,), 0, 2**31 - 1, jnp.int32)
            return fresh_packed_fused(cfg, seeds[0], n, seed2=seeds[1])
    return fresh_packed_batch(cfg, key, n)


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2,),
         static_argnames=("fused_pool", "fused_update"))
def train_step_fast(cfg: EnvConfig, fppo: FastPPOConfig, ts: FastTrainState,
                    env: PackedState, key, *,
                    fused_pool: bool | None = None,
                    fused_update: bool | None = None):
    """One PPO iteration on the packed engine. Returns (ts, env, key, metrics).

    ``fused_pool``: auto-reset pool source — None (default) auto-selects the
    fused Pallas generator on TPU; False forces the partitioner-safe
    jax.random path (required under a multi-device mesh, see _fresh_pool).
    ``fused_update``: gradient path — None (default) auto-selects the fused
    Pallas update kernel on TPU; False forces the autodiff path. Like the
    pool kernel, the update kernel's raw pallas_call is not shard_map-wrapped
    here, so multi-device wrappers must pass False (the shard_map-wrapped
    per-device form lives in parallel/sharded_engine.py and the dryrun's
    grad-psum path).
    """
    key, k_pool, k_roll, k_perm = jax.random.split(key, 4)
    B_env = env.agent_r.shape[-1]
    pool = _fresh_pool(cfg, k_pool, 2 * B_env, fused=fused_pool)
    env, traj = _collect(cfg, fppo, ts.params, env, pool, k_roll)
    _, last_value = apply_policy(ts.params, features(cfg, env))
    adv, ret = _gae(fppo, traj, last_value)

    T, B = traj.action.shape
    # Shuffle in blocks of lane tiles, not per sample: a per-sample
    # permutation of the T*B samples is a fine-grained gather the TPU
    # serialises element-by-element (~180ms/update measured); permuting
    # whole lane-tile blocks along the major axis moves the same bytes at
    # HBM speed (and the fused kernel skips even that — see _update_phase).
    shuffle_block(T, B, fppo.num_minibatches)  # raises if shapes don't tile
    params, opt_state, losses, auxes = _update_phase(
        fppo, ts, traj, adv, ret, k_perm, use_fused_kernel=fused_update
    )

    successes = (traj.raw_reward == cfg.max_steps).sum()
    metrics = {
        "loss": losses.mean(),
        "reward_mean": traj.reward.mean(),
        "episode_done_frac": traj.done.mean(),
        "success_rate": successes / jnp.maximum(traj.done.sum(), 1),
        "success_per_step": successes / (T * B),
        **{k: v.mean() for k, v in auxes.items()},
    }
    ts = FastTrainState(params=params, opt_state=opt_state,
                        update_idx=ts.update_idx + 1)
    return ts, env, key, metrics


@partial(jax.jit, static_argnums=(0, 1, 4), donate_argnums=(2,),
         static_argnames=("fused_pool", "fused_update"))
def train_many_fast(cfg: EnvConfig, fppo: FastPPOConfig, ts: FastTrainState,
                    env: PackedState, num_updates: int, key, *,
                    fused_pool: bool | None = None,
                    fused_update: bool | None = None):
    """``num_updates`` fully-on-device PPO iterations in one dispatch.

    Metrics come back stacked [num_updates]; use this for throughput
    measurement (amortises the relay round trip) and long training runs.
    """

    def body(carry, _):
        ts, env, key = carry
        ts, env, key, metrics = train_step_fast(cfg, fppo, ts, env, key,
                                                fused_pool=fused_pool,
                                                fused_update=fused_update)
        return (ts, env, key), metrics

    (ts, env, key), metrics = jax.lax.scan(
        body, (ts, env, key), None, length=num_updates
    )
    return ts, env, key, metrics
