"""PPO over the sharded env batch.

One fully-jitted ``train_step``: on-device rollout (lax.scan over the batched
env step with auto-reset), GAE, and clipped-surrogate updates over shuffled
minibatches. The env batch (and therefore every rollout tensor) is sharded
over the mesh's 'env' axis; parameters are replicated, so XLA inserts exactly
one gradient ``psum`` over ICI per minibatch — the only cross-chip
communication in the system (env stepping itself is communication-free).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.reset import _reset_one
from gym_craftingworld_tpu.core.state import EnvState
from gym_craftingworld_tpu.core.step import _step_one
from gym_craftingworld_tpu.models.actor_critic import ActorCritic


class PPOConfig(NamedTuple):
    rollout_steps: int = 64
    update_epochs: int = 2
    num_minibatches: int = 4
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    hidden: int = 512
    policy: str = "mlp"  # "mlp" (one-hot features) | "cnn" (pixel renders)


class Transition(NamedTuple):
    obs: "Snapshot"
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    update_idx: jax.Array


class Snapshot(NamedTuple):
    """Compact per-step state capture stored in rollouts.

    Observations are recomputed from this in the loss instead of being stored:
    the one-hot/pixel features are ~40x larger than the packed state, so
    storing snapshots and rebuilding features per minibatch trades a trivial
    amount of compute for gigabytes of HBM and shuffle-gather traffic.
    """

    objects: jax.Array  # int8[B, H, W]
    agent: jax.Array  # int32[B, 2]
    holding: jax.Array  # int32[B]
    desired: jax.Array  # int8[B, 9]
    achieved: jax.Array  # int8[B, 9]


def snapshot(state: EnvState) -> Snapshot:
    return Snapshot(
        objects=state.objects,
        agent=state.agent,
        holding=state.holding,
        desired=state.desired,
        achieved=state.achieved,
    )


def make_policy(ppo: PPOConfig):
    """Model family dispatch: returns (model, apply(params, snapshot))."""
    if ppo.policy == "mlp":
        from gym_craftingworld_tpu.render.raster import render_onehot

        model = ActorCritic(hidden=ppo.hidden)

        def apply_fn(params, snap: Snapshot):
            B = snap.objects.shape[0]
            grid = render_onehot(snap.objects, snap.agent, snap.holding)
            obs = jnp.concatenate(
                [
                    grid.reshape(B, -1).astype(jnp.float32),
                    snap.desired.astype(jnp.float32),
                    snap.achieved.astype(jnp.float32),
                ],
                axis=-1,
            )
            return model.apply(params, obs)

        return model, apply_fn
    if ppo.policy == "cnn":
        from gym_craftingworld_tpu.models.cnn import PixelActorCritic
        from gym_craftingworld_tpu.render.raster import render_ray

        model = PixelActorCritic(hidden=ppo.hidden)

        def apply_fn(params, snap: Snapshot):
            pixels = render_ray(snap.objects, snap.agent, snap.holding)
            goal_bits = jnp.concatenate(
                [snap.desired.astype(jnp.float32),
                 snap.achieved.astype(jnp.float32)],
                axis=-1,
            )
            return model.apply(params, pixels, goal_bits)

        return model, apply_fn
    if ppo.policy == "vit":
        from gym_craftingworld_tpu.models.vit import GridActorCritic
        from gym_craftingworld_tpu.render.raster import render_onehot

        model = GridActorCritic(hidden=ppo.hidden)

        def apply_fn(params, snap: Snapshot):
            B, H, W = snap.objects.shape
            grid = render_onehot(snap.objects, snap.agent, snap.holding)
            cells = grid.reshape(B, H * W, grid.shape[-1])
            goal_bits = jnp.concatenate(
                [snap.desired.astype(jnp.float32),
                 snap.achieved.astype(jnp.float32)],
                axis=-1,
            )
            return model.apply(params, cells, goal_bits)

        return model, apply_fn
    raise ValueError(f"unknown policy family {ppo.policy!r}")


def make_optimizer(ppo: PPOConfig):
    return optax.chain(
        optax.clip_by_global_norm(ppo.max_grad_norm),
        optax.adam(ppo.lr),
    )


def init_train_state(key, cfg: EnvConfig, ppo: PPOConfig) -> TrainState:
    if ppo.policy == "cnn":
        from gym_craftingworld_tpu.models.cnn import init_params
    elif ppo.policy == "vit":
        from gym_craftingworld_tpu.models.vit import init_params
    else:
        from gym_craftingworld_tpu.models.actor_critic import init_params

    _, params = init_params(key, cfg.height, cfg.width, ppo.hidden)
    opt_state = make_optimizer(ppo).init(params)
    return TrainState(params=params, opt_state=opt_state,
                      update_idx=jnp.int32(0))


def _collect(cfg: EnvConfig, ppo: PPOConfig, apply_fn, params,
             env_state: EnvState, key):
    """On-device rollout of ``rollout_steps``; auto-resets finished episodes."""

    def body(carry, _):
        st, k = carry
        k, k_act = jax.random.split(k)
        obs = snapshot(st)
        logits, value = apply_fn(params, obs)
        action = jax.random.categorical(k_act, logits)
        log_prob = jax.nn.log_softmax(logits)[
            jnp.arange(logits.shape[0]), action
        ]
        st2, res = jax.vmap(partial(_step_one, cfg))(st, action.astype(jnp.int32))
        # normalise reward scale: success = +1, step cost ~ -1/max_steps
        reward = jnp.where(
            res.reward == cfg.max_steps, 1.0, -1.0 / cfg.max_steps
        ).astype(jnp.float32)
        keys = jax.vmap(jax.random.wrap_key_data)(st2.rng)
        fresh = jax.vmap(partial(_reset_one, cfg))(keys)
        st2 = jax.tree.map(
            lambda f, s: jnp.where(
                res.done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s
            ),
            fresh,
            st2,
        )
        tr = Transition(obs=obs, action=action, log_prob=log_prob, value=value,
                        reward=reward, done=res.done)
        return (st2, k), tr

    (env_state, key), traj = jax.lax.scan(
        body, (env_state, key), None, length=ppo.rollout_steps
    )
    return env_state, traj


def _gae(ppo: PPOConfig, traj: Transition, last_value: jax.Array):
    def body(carry, tr):
        gae, next_value = carry
        not_done = 1.0 - tr.done.astype(jnp.float32)
        delta = tr.reward + ppo.gamma * next_value * not_done - tr.value
        gae = delta + ppo.gamma * ppo.gae_lambda * not_done * gae
        return (gae, tr.value), gae

    (_, _), advantages = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
    )
    return advantages, advantages + traj.value


def _ppo_loss(ppo: PPOConfig, apply_fn, params, batch):
    obs, action, old_log_prob, old_value, adv, ret = batch
    logits, value = apply_fn(params, obs)
    log_probs = jax.nn.log_softmax(logits)
    log_prob = log_probs[jnp.arange(logits.shape[0]), action]
    ratio = jnp.exp(log_prob - old_log_prob)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    pg = -jnp.minimum(
        ratio * adv_n,
        jnp.clip(ratio, 1 - ppo.clip_eps, 1 + ppo.clip_eps) * adv_n,
    ).mean()
    v_clipped = old_value + jnp.clip(
        value - old_value, -ppo.clip_eps, ppo.clip_eps
    )
    v_loss = 0.5 * jnp.maximum(
        (value - ret) ** 2, (v_clipped - ret) ** 2
    ).mean()
    entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
    loss = pg + ppo.vf_coef * v_loss - ppo.ent_coef * entropy
    return loss, {"pg_loss": pg, "v_loss": v_loss, "entropy": entropy}


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def train_step(cfg: EnvConfig, ppo: PPOConfig, ts: TrainState,
               env_state: EnvState, key):
    """One PPO iteration: rollout → GAE → minibatched clipped updates."""
    _, apply_fn = make_policy(ppo)
    key, k_roll, k_perm = jax.random.split(key, 3)
    env_state, traj = _collect(cfg, ppo, apply_fn, ts.params,
                               env_state, k_roll)
    _, last_value = apply_fn(ts.params, snapshot(env_state))
    adv, ret = _gae(ppo, traj, last_value)

    T, B = traj.action.shape
    merge = lambda x: x.reshape((T * B,) + x.shape[2:])
    flat = (
        jax.tree.map(merge, traj.obs),
        merge(traj.action),
        merge(traj.log_prob),
        merge(traj.value),
        merge(adv),
        merge(ret),
    )
    optimizer = make_optimizer(ppo)

    def epoch(carry, k_e):
        params, opt_state = carry
        perm = jax.random.permutation(k_e, T * B)
        mb_size = (T * B) // ppo.num_minibatches

        def minibatch(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
            batch = tuple(jax.tree.map(lambda x: x[idx], x) for x in flat)
            (loss, aux), grads = jax.value_and_grad(
                lambda p: _ppo_loss(ppo, apply_fn, p, batch), has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, aux)

        (params, opt_state), (losses, auxes) = jax.lax.scan(
            minibatch, (params, opt_state), jnp.arange(ppo.num_minibatches)
        )
        return (params, opt_state), (losses, auxes)

    keys_e = jax.random.split(k_perm, ppo.update_epochs)
    (params, opt_state), (losses, auxes) = jax.lax.scan(
        epoch, (ts.params, ts.opt_state), keys_e
    )

    metrics = {
        "loss": losses.mean(),
        "reward_mean": traj.reward.mean(),
        "episode_done_frac": traj.done.mean(),
        "success_rate": (traj.reward > 0.5).sum()
        / jnp.maximum(traj.done.sum(), 1),
        **{k: v.mean() for k, v in auxes.items()},
    }
    ts = TrainState(params=params, opt_state=opt_state,
                    update_idx=ts.update_idx + 1)
    return ts, env_state, key, metrics
