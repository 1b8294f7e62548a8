"""Packed fused Pallas kernel vs the packed scan engine: exact equivalence on
matched action streams (kernel run in TPU-interpret mode on CPU)."""

import importlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_craftingworld_tpu import flat_config, ray_config, reset_from_seed
from gym_craftingworld_tpu.core import slots as sm
from gym_craftingworld_tpu.ops import packed_rollout as pr

pf = importlib.import_module("gym_craftingworld_tpu.ops.packed_fused")


# kernels run via the interpret=/block= parameters (TPU interpreter on CPU)
_KW = dict(interpret=True, block=128)


@pytest.mark.parametrize("cfg,seed", [(ray_config(), 0), (flat_config(), 1)])
def test_packed_fused_actions_equals_packed_scan(cfg, seed):
    B, T = 256, 64
    st = reset_from_seed(cfg, seed, B)
    sl = sm.from_env_state(st)

    actions = jax.random.randint(jax.random.PRNGKey(9), (T, B), 0, 6, jnp.int32)

    sl_fused, rewards_f, dones_f = pf.fused_rollout_packed(cfg, sl, actions, T, **_KW)
    sl_scan, out_s = pr.rollout_p(cfg, sm.from_env_state(st), actions, T)

    np.testing.assert_array_equal(np.asarray(rewards_f), np.asarray(out_s.reward))
    np.testing.assert_array_equal(np.asarray(dones_f), np.asarray(out_s.done))
    for field in ["slot_type", "slot_stat", "agent", "achieved", "step_num"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(sl_fused, field)),
            np.asarray(getattr(sl_scan, field)),
            err_msg=field,
        )
    live = np.asarray(sl_scan.slot_stat) != sm.REMOVED
    np.testing.assert_array_equal(
        np.asarray(sl_fused.slot_pos)[live], np.asarray(sl_scan.slot_pos)[live]
    )


def test_packed_fused_bench_checksum_consistent():
    """The bench kernel's checksum equals re-stepping its own trajectory is
    not checkable (in-kernel PRNG), but the checksum must be deterministic
    for a fixed seed and the final state must satisfy engine invariants."""
    cfg = ray_config()
    B, T = 256, 32
    st = reset_from_seed(cfg, 0, B)
    sl = sm.from_env_state(st)

    s1, c1 = pf.fused_rollout_packed_bench(cfg, sl, 7, T, **_KW)
    s2, c2 = pf.fused_rollout_packed_bench(cfg, sl, 7, T, **_KW)
    assert int(c1) == int(c2)
    np.testing.assert_array_equal(np.asarray(s1.agent), np.asarray(s2.agent))

    # NOTE: interpret mode stubs pltpu.prng_random_bits to zeros (every
    # action decodes to "up"), so seed-divergence of the action stream can
    # only be validated on real TPU — the bench harness does.

    assert np.asarray(s1.step_num).min() == T
    # exactly one slot of each type remains accounted for (on grid, held, or
    # removed) — statuses stay in range
    stat = np.asarray(s1.slot_stat)
    assert set(np.unique(stat)) <= {sm.ON_GRID, sm.HELD, sm.REMOVED}
