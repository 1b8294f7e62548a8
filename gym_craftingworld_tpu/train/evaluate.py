"""Policy evaluation: success and per-skill completion metrics.

Batched on-device evaluation for learned policies (greedy argmax actions,
one episode per env slot) and host-side evaluation for the scripted expert.
Produces the skill-completion-rate observability metrics called out in
SURVEY §5 (the reference exposes only the per-step info dict).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.reset import reset
from gym_craftingworld_tpu.core.step import _step_one
from gym_craftingworld_tpu.train.ppo import PPOConfig, make_policy, snapshot


@partial(jax.jit, static_argnums=(0, 1))
def _eval_batch(cfg: EnvConfig, ppo: PPOConfig, params, keys):
    """One greedy episode per env; returns terminal stats."""
    _, apply_fn = make_policy(ppo)
    state = reset(cfg, keys)

    def body(carry):
        st, done, reward = carry
        logits, _ = apply_fn(params, snapshot(st))
        action = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        st2, res = jax.vmap(partial(_step_one, cfg))(st, action)
        # freeze finished episodes
        st2 = jax.tree.map(
            lambda new, old: jnp.where(
                done.reshape((-1,) + (1,) * (new.ndim - 1)), old, new
            ),
            st2,
            st,
        )
        reward = jnp.where(done, reward, res.reward)
        done = done | res.done
        return st2, done, reward

    def cond(carry):
        _, done, _ = carry
        return ~jnp.all(done)

    B = keys.shape[0]
    init = (state, jnp.zeros(B, bool), jnp.full(B, -1, jnp.int32))
    state, done, reward = jax.lax.while_loop(cond, body, init)
    success = reward == cfg.max_steps
    return {
        "success": success,
        "steps": state.step_num,
        "desired": state.desired,
        "achieved": state.achieved,
    }


def evaluate_policy(cfg: EnvConfig, ppo: PPOConfig, params, num_episodes: int,
                    seed: int = 0):
    """Greedy-policy evaluation over ``num_episodes`` parallel episodes."""
    keys = jax.random.split(jax.random.PRNGKey(seed), num_episodes)
    out = _eval_batch(cfg, ppo, params, jax.random.key_data(keys))
    return summarize(out)


def summarize(out) -> dict:
    success = np.asarray(out["success"])
    desired = np.asarray(out["desired"]).astype(bool)
    achieved = np.asarray(out["achieved"]).astype(bool)
    per_skill = {}
    for k, name in enumerate(C.TASK_LIST):
        sel = desired[:, k]
        per_skill[name] = float(achieved[sel, k].mean()) if sel.any() else None
    return {
        "success_rate": float(success.mean()),
        "mean_episode_steps": float(np.asarray(out["steps"]).mean()),
        "episodes": int(success.shape[0]),
        "skill_completion": per_skill,
    }


def evaluate_expert(num_episodes: int = 20, seed: int = 0, **env_kwargs):
    """Host-side expert evaluation through the public API shim."""
    from gym_craftingworld_tpu.agents.expert import ExpertPolicy
    from gym_craftingworld_tpu.api import CraftingWorldEnvRay

    desired, achieved, success, steps = [], [], [], []
    for ep in range(num_episodes):
        env = CraftingWorldEnvRay(seed=seed + ep, **env_kwargs)
        env.reset()
        reward = ExpertPolicy(env).run_episode()
        desired.append(env.desired_goal_vector[0].copy())
        achieved.append(env.achieved_goal_vector[0].copy())
        success.append(reward == env.MAX_STEPS)
        steps.append(env.step_num)
    return summarize(
        {
            "success": np.asarray(success),
            "steps": np.asarray(steps),
            "desired": np.stack(desired),
            "achieved": np.stack(achieved),
        }
    )
