"""Multi-step rollouts compiled as a single on-device program.

The reference steps one env per Python call; here T steps x B envs run as one
``lax.scan`` under jit, so the grid never leaves the device between steps and
dispatch overhead is amortised across the whole trajectory. This is the
throughput path behind the benchmark and the PPO harness.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.reset import _reset_one
from gym_craftingworld_tpu.core.state import EnvState
from gym_craftingworld_tpu.core.step import _step_one


class RolloutOut(NamedTuple):
    reward: jax.Array  # int32[T, B]
    done: jax.Array  # bool[T, B]


def _scan_steps(cfg: EnvConfig, state: EnvState, actions: jax.Array, auto_reset: bool):
    def body(carry: EnvState, action_t: jax.Array):
        st, res = jax.vmap(partial(_step_one, cfg))(carry, action_t)
        if auto_reset:
            # Vectorised auto-reset: build fresh states from each env's own key
            # and select per env. Fixed shapes; the reset cost is paid every
            # step but fully parallel across the batch.
            keys = jax.vmap(jax.random.wrap_key_data)(st.rng)
            fresh = jax.vmap(partial(_reset_one, cfg))(keys)
            st = jax.tree.map(
                lambda f, s: jnp.where(
                    res.done.reshape((-1,) + (1,) * (s.ndim - 1)), f, s
                ),
                fresh,
                st,
            )
        return st, RolloutOut(reward=res.reward, done=res.done)

    return jax.lax.scan(body, state, actions)


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=1)
def rollout(
    cfg: EnvConfig, state: EnvState, actions: jax.Array, auto_reset: bool = False
):
    """Run ``actions: int32[T, B]`` through the env. Returns (state, RolloutOut)."""
    return _scan_steps(cfg, state, actions, auto_reset)


@partial(jax.jit, static_argnums=(0, 3), donate_argnums=1)
def rollout_random(
    cfg: EnvConfig, state: EnvState, key: jax.Array, num_steps: int
):
    """Throughput harness: T steps of uniform-random actions generated on device."""
    B = state.objects.shape[0]
    actions = jax.random.randint(key, (num_steps, B), 0, 6, dtype=jnp.int32)
    return _scan_steps(cfg, state, actions, auto_reset=False)
