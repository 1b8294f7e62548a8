"""Imitation learning: expert demonstrations → behavioral cloning.

CraftingWorld was built for demonstration-conditioned learning
("Compositional Plan Vectors", NeurIPS 2019 — reference README.md:8), but the
reference repo ships no data-collection or training code. This module closes
that loop framework-natively:

  * :func:`collect_demos` drives the scripted expert (agents/expert.py)
    through seeded episodes of the single-env API shim and records
    (goal-conditioned feature, expert action) pairs;
  * :func:`bc_train` clones the flagship actor-critic policy
    (models/actor_critic.py) from them with a jitted cross-entropy trainer —
    the compute path is the same bf16 MXU-tiled MLP the PPO learner uses, so
    a BC-pretrained policy drops straight into train/ppo.py for fine-tuning;
  * :func:`evaluate_bc` rolls the cloned policy greedily and reports success.

Demo collection is host-side by necessity (the expert is a host planner);
training and evaluation forward passes are jitted.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.agents.expert import ExpertPolicy
from gym_craftingworld_tpu.api.gym_env import CraftingWorldEnvRay
from gym_craftingworld_tpu.models.actor_critic import init_params, obs_features


class Demos(NamedTuple):
    """Flat demonstration dataset (episodes concatenated)."""

    features: np.ndarray  # f32[N, D] — obs_features rows
    actions: np.ndarray  # i32[N] — expert action per row
    episode: np.ndarray  # i32[N] — source episode index (for splits)

    @property
    def num_episodes(self) -> int:
        return int(self.episode.max()) + 1 if self.episode.size else 0

    def save(self, path: str) -> None:
        np.savez_compressed(path, features=self.features,
                            actions=self.actions, episode=self.episode)

    @classmethod
    def load(cls, path: str) -> "Demos":
        with np.load(path) as z:
            return cls(z["features"], z["actions"], z["episode"])


def collect_demos(num_episodes: int, seed: int = 0,
                  only_successful: bool = True, **env_kwargs) -> Demos:
    """Expert demonstrations over ``num_episodes`` seeded resets.

    ``env_kwargs`` pass through to :class:`CraftingWorldEnvRay` (grid size,
    ``selected_tasks``, ``stacking``, ``fixed_init_state`` pool, ...). With
    ``only_successful`` (default) episodes where the expert failed are
    dropped, so the dataset contains only goal-reaching behaviour.
    """
    env = CraftingWorldEnvRay(seed=seed, **env_kwargs)
    feats: list[np.ndarray] = []
    acts: list[int] = []
    eps: list[int] = []
    kept = 0
    for _ in range(num_episodes):
        env.reset()
        expert = ExpertPolicy(env)
        ep_f: list[np.ndarray] = []
        ep_a: list[int] = []
        reward = -1
        for _ in range(env.MAX_STEPS):
            a = expert.action()
            if a is None:  # stalled: mirror ExpertPolicy.run_episode
                a = C.ACTION_UP
            ep_f.append(np.asarray(obs_features(env.state))[0])
            ep_a.append(int(a))
            _, reward, done, _ = env.step(int(a))
            if done:
                break
        if only_successful and reward != env.MAX_STEPS:
            continue
        feats.extend(ep_f)
        acts.extend(ep_a)
        eps.extend([kept] * len(ep_a))
        kept += 1
    if not feats:
        raise ValueError("expert produced no successful demonstrations")
    return Demos(
        np.stack(feats).astype(np.float32),
        np.asarray(acts, np.int32),
        np.asarray(eps, np.int32),
    )


def bc_train(demos: Demos, key, height: int, width: int, hidden: int = 256,
             epochs: int = 30, batch_size: int = 256, lr: float = 1e-3):
    """Clone the expert: cross-entropy on actions over shuffled minibatches.

    Returns ``(model, params, metrics)`` where metrics carries per-epoch
    ``loss`` and final training ``accuracy``. The params are a standard
    ActorCritic pytree — reusable as a PPO init (the value head stays at its
    random init; only the policy head and torso receive BC gradients through
    the policy loss).
    """
    from gym_craftingworld_tpu.models.actor_critic import feature_dim

    if demos.features.shape[1] != feature_dim(height, width):
        raise ValueError(
            f"demo feature width {demos.features.shape[1]} does not match "
            f"a {height}x{width} grid ({feature_dim(height, width)})"
        )
    key, init_key = jax.random.split(key)
    model, params = init_params(init_key, height, width, hidden)

    tx = optax.adam(lr)
    opt_state = tx.init(params)
    feats = jnp.asarray(demos.features)
    actions = jnp.asarray(demos.actions)
    n = feats.shape[0]
    batch_size = min(batch_size, n)

    @jax.jit
    def train_step(params, opt_state, fb, ab):
        def loss_fn(p):
            logits, _ = model.apply(p, fb)
            logp = jax.nn.log_softmax(logits)
            return -jnp.take_along_axis(logp, ab[:, None], axis=1).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    steps = max(1, n // batch_size)
    for epoch in range(epochs):
        key, k = jax.random.split(key)
        perm = jax.random.permutation(k, n)
        ep_loss = 0.0
        for i in range(steps):
            idx = perm[i * batch_size : (i + 1) * batch_size]
            params, opt_state, loss = train_step(
                params, opt_state, feats[idx], actions[idx]
            )
            ep_loss += float(loss)
        losses.append(ep_loss / steps)

    metrics = {
        "loss": losses,
        "accuracy": float(bc_accuracy(model, params, demos)),
    }
    return model, params, metrics


def bc_accuracy(model, params, demos: Demos) -> float:
    """Fraction of dataset rows where argmax policy == expert action."""
    logits, _ = jax.jit(model.apply)(params, jnp.asarray(demos.features))
    return float(
        (jnp.argmax(logits, axis=-1) == jnp.asarray(demos.actions)).mean()
    )


def evaluate_bc(model, params, num_episodes: int, seed: int = 0,
                **env_kwargs) -> dict:
    """Greedy rollouts of the cloned policy; returns success/return stats.

    Uses the same single-env shim configuration demos were collected with, so
    pool-based setups (``fixed_init_state``) evaluate on the demonstrated
    layouts. Forward passes are jitted; the env loop is the interactive shim.
    """
    env = CraftingWorldEnvRay(seed=seed, **env_kwargs)
    apply = jax.jit(lambda p, f: model.apply(p, f)[0])
    successes, steps_used = 0, []
    for _ in range(num_episodes):
        env.reset()
        reward = -1
        for t in range(env.MAX_STEPS):
            a = int(jnp.argmax(apply(params, obs_features(env.state))[0]))
            _, reward, done, _ = env.step(a)
            if done:
                break
        if reward == env.MAX_STEPS:
            successes += 1
            steps_used.append(t + 1)
    return {
        "success_rate": successes / num_episodes,
        "mean_success_steps": float(np.mean(steps_used)) if steps_used else None,
        "episodes": num_episodes,
    }
