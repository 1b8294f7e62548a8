"""Batch-size consistency of the grid engine on real TPU silicon.

Regression guard for an XLA:TPU miscompile found in round 3: the original
``core.step._step_one`` wrote its two grid cells with vmapped data-dependent
scatters (``objects.at[r, c].set``), and at batch sizes >= ~1024-1536 on v5e
the compiled program silently dropped the object-effect write while still
moving the agent (full-batch stepping diverged from split-batch stepping on
identical states; the CPU backend agreed with split-batch). The engine is now
scatter/gather-free (dense one-hot compare-selects) and this test pins the
invariant the bug broke: stepping a batch of B envs must equal stepping any
partition of it, bit for bit, at every batch size we train/evaluate at.

The reference env has no batching at all (craftingworld_ray.py steps one env
in-place), so per-env independence *is* the spec; only the TPU backend can
violate it, which is why this lives in tests_tpu/.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.reset import reset as core_reset
from gym_craftingworld_tpu.core.step import _step_one

CFG = EnvConfig(height=21, width=21, max_steps=300, stacking=True)

STATE_FIELDS = ["objects", "agent", "holding", "achieved", "step_num"]


@partial(jax.jit, static_argnums=0)
def _reset(cfg, kd):
    return core_reset(cfg, kd)


@partial(jax.jit, static_argnums=0)
def _step(cfg, st, a):
    return jax.vmap(partial(_step_one, cfg))(st, a)


def _cat(a, b):
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y], 0), a, b)


def test_step_full_equals_split_at_train_batches():
    """B-batch step == (B/2 || B/2) step, bit for bit, at the bad shapes."""
    for B in (1024, 1536, 4096):
        kd = jax.random.key_data(
            jax.random.split(jax.random.PRNGKey(31337 + B), B)
        )
        st = _reset(CFG, kd)
        rng = np.random.RandomState(B)
        for t in range(8):
            # mostly moves with pickup/drop mixed in, like a real policy
            a = jnp.asarray(rng.randint(0, 6, B), jnp.int32)
            full, res_full = _step(CFG, st, a)
            h = B // 2
            lo, res_lo = _step(CFG, jax.tree.map(lambda x: x[:h], st), a[:h])
            hi, res_hi = _step(CFG, jax.tree.map(lambda x: x[h:], st), a[h:])
            split = _cat(lo, hi)
            for f in STATE_FIELDS:
                np.testing.assert_array_equal(
                    np.asarray(getattr(full, f)),
                    np.asarray(getattr(split, f)),
                    err_msg=f"B={B} t={t} field={f}",
                )
            np.testing.assert_array_equal(
                np.asarray(res_full.reward),
                np.concatenate(
                    [np.asarray(res_lo.reward), np.asarray(res_hi.reward)]
                ),
                err_msg=f"B={B} t={t} reward",
            )
            st = full


def test_reset_full_equals_split():
    """Batched reset is per-env independent on silicon at training scale."""
    B = 4096
    kd = jax.random.key_data(jax.random.split(jax.random.PRNGKey(7), B))
    full = _reset(CFG, kd)
    h = B // 2
    split = _cat(_reset(CFG, kd[:h]), _reset(CFG, kd[h:]))
    for f in STATE_FIELDS + ["desired", "init_objects", "goal_objects"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(full, f)),
            np.asarray(getattr(split, f)),
            err_msg=f"reset field={f}",
        )
