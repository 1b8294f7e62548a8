"""Recurrent PPO: sequence-aware rollouts and updates for the GRU family.

Differences from the feed-forward path (train/ppo.py):
  * the rollout scan carries (env_state, hidden) and stores per-step dones so
    the GRU can reset at episode boundaries;
  * minibatches shuffle over the ENV axis (whole sequences stay intact) and
    the loss re-runs the GRU over the full T steps from the rollout's initial
    hidden state — the standard truncated-BPTT PPO formulation.
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
from gym_craftingworld_tpu.models.actor_critic import feature_dim
from gym_craftingworld_tpu.models.rnn import RecurrentActorCritic
from gym_craftingworld_tpu.render.raster import render_onehot
from gym_craftingworld_tpu.train.ppo import PPOConfig, Snapshot, make_optimizer, snapshot


class RnnTransition(NamedTuple):
    obs: Snapshot
    prev_done: jax.Array  # bool[B] — episode boundary BEFORE this step
    action: jax.Array
    log_prob: jax.Array
    value: jax.Array
    reward: jax.Array
    done: jax.Array


class RnnTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    hidden: jax.Array  # f32[B, H] — carried across train steps
    prev_done: jax.Array  # bool[B]
    update_idx: jax.Array


def _features(snap: Snapshot):
    B = snap.objects.shape[0]
    grid = render_onehot(snap.objects, snap.agent, snap.holding)
    return jnp.concatenate(
        [
            grid.reshape(B, -1).astype(jnp.float32),
            snap.desired.astype(jnp.float32),
            snap.achieved.astype(jnp.float32),
        ],
        axis=-1,
    )


def init_rnn_train_state(key, cfg: EnvConfig, ppo: PPOConfig,
                         batch_size: int) -> RnnTrainState:
    from gym_craftingworld_tpu.models.rnn import init_params

    model, params = init_params(
        key, feature_dim(cfg.height, cfg.width), ppo.hidden, batch_size
    )
    opt_state = make_optimizer(ppo).init(params)
    return RnnTrainState(
        params=params,
        opt_state=opt_state,
        hidden=model.initial_state(batch_size),
        prev_done=jnp.zeros((batch_size,), bool),
        update_idx=jnp.int32(0),
    )


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def train_step_rnn(cfg: EnvConfig, ppo: PPOConfig, ts: RnnTrainState,
                   env_state: EnvState, key):
    model = RecurrentActorCritic(hidden=ppo.hidden)
    key, k_roll, k_perm = jax.random.split(key, 3)

    h0 = ts.hidden
    d0 = ts.prev_done

    def body(carry, k_t):
        st, h, prev_done = carry
        snap = snapshot(st)
        obs = _features(snap)
        h, logits, value = model.apply(ts.params, h, obs, prev_done)
        action = jax.random.categorical(k_t, logits)
        log_prob = jax.nn.log_softmax(logits)[
            jnp.arange(logits.shape[0]), action
        ]
        st2, res = jax.vmap(partial(_step_one, cfg))(st, action.astype(jnp.int32))
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
        tr = RnnTransition(obs=snap, prev_done=prev_done, action=action,
                           log_prob=log_prob, value=value, reward=reward,
                           done=res.done)
        return (st2, h, res.done), tr

    keys_t = jax.random.split(k_roll, ppo.rollout_steps)
    (env_state, hidden, prev_done), traj = jax.lax.scan(
        body, (env_state, h0, d0), keys_t
    )

    # bootstrap value for GAE
    _, _, last_value = model.apply(
        ts.params, hidden, _features(snapshot(env_state)), prev_done
    )

    def gae_body(carry, tr):
        gae, next_value = carry
        not_done = 1.0 - tr.done.astype(jnp.float32)
        delta = tr.reward + ppo.gamma * next_value * not_done - tr.value
        gae = delta + ppo.gamma * ppo.gae_lambda * not_done * gae
        return (gae, tr.value), gae

    (_, _), adv = jax.lax.scan(
        gae_body, (jnp.zeros_like(last_value), last_value), traj, reverse=True
    )
    ret = adv + traj.value

    T, B = traj.action.shape
    optimizer = make_optimizer(ppo)
    n_mb = ppo.num_minibatches
    assert B % n_mb == 0, "batch must divide num_minibatches"
    mb_envs = B // n_mb

    def seq_loss(params, mb):
        traj_mb, adv_mb, ret_mb, h0_mb = mb

        def rnn_step(h, inputs):
            snap_t, pd_t = inputs
            h, logits, value = model.apply(params, h, _features(snap_t), pd_t)
            return h, (logits, value)

        _, (logits, value) = jax.lax.scan(
            rnn_step, h0_mb, (traj_mb.obs, traj_mb.prev_done)
        )
        log_probs = jax.nn.log_softmax(logits)  # [T, mb, A]
        t_idx = jnp.arange(T)[:, None]
        e_idx = jnp.arange(mb_envs)[None, :]
        log_prob = log_probs[t_idx, e_idx, traj_mb.action]
        ratio = jnp.exp(log_prob - traj_mb.log_prob)
        a_n = (adv_mb - adv_mb.mean()) / (adv_mb.std() + 1e-8)
        pg = -jnp.minimum(
            ratio * a_n,
            jnp.clip(ratio, 1 - ppo.clip_eps, 1 + ppo.clip_eps) * a_n,
        ).mean()
        v_clipped = traj_mb.value + jnp.clip(
            value - traj_mb.value, -ppo.clip_eps, ppo.clip_eps
        )
        v_loss = 0.5 * jnp.maximum(
            (value - ret_mb) ** 2, (v_clipped - ret_mb) ** 2
        ).mean()
        entropy = -(jnp.exp(log_probs) * log_probs).sum(-1).mean()
        return pg + ppo.vf_coef * v_loss - ppo.ent_coef * entropy

    def epoch(carry, k_e):
        params, opt_state = carry
        perm = jax.random.permutation(k_e, B)

        def minibatch(carry, i):
            params, opt_state = carry
            idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_envs, mb_envs)
            mb = (
                jax.tree.map(lambda x: x[:, idx], traj),
                adv[:, idx],
                ret[:, idx],
                h0[idx],
            )
            loss, grads = jax.value_and_grad(seq_loss)(params, mb)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        return jax.lax.scan(minibatch, (params, opt_state), jnp.arange(n_mb))

    keys_e = jax.random.split(k_perm, ppo.update_epochs)
    (params, opt_state), losses = jax.lax.scan(
        epoch, (ts.params, ts.opt_state), keys_e
    )

    metrics = {
        "loss": losses.mean(),
        "reward_mean": traj.reward.mean(),
        "success_rate": (traj.reward > 0.5).sum()
        / jnp.maximum(traj.done.sum(), 1),
    }
    ts = RnnTrainState(
        params=params,
        opt_state=opt_state,
        hidden=hidden,
        prev_done=prev_done,
        update_idx=ts.update_idx + 1,
    )
    return ts, env_state, key, metrics
