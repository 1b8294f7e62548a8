"""Orbax checkpointing of the full training system.

The reference has no persistence beyond GIFs (SURVEY §5); here the whole
(learner params, optimizer state, env batch state, PRNG key, update index)
tuple is checkpointed so a run resumes bit-identically on any host count —
env trajectories are pure functions of (state, key), so restarts are
deterministic by construction.
"""

from __future__ import annotations

import jax
import orbax.checkpoint as ocp


def _as_ckpt(ts, env_state, key, step: int):
    if hasattr(key, "dtype") and jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        key = jax.random.key_data(key)
    return {
        "train_state": ts._asdict() if hasattr(ts, "_asdict") else ts,
        "env_state": env_state,
        "key": key,
        "step": step,
    }


def save(path: str, ts, env_state, key, step: int):
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _as_ckpt(ts, env_state, key, step), force=True)


def restore(path: str, template):
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
