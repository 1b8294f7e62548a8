"""Packed-key engine: exact equivalence with the transposed scan path.

The transposed scan is itself lock-step parity-tested against the reference
(tests/test_parity_trajectory.py, test_slots_equivalence.py), so equality here
chains back to bit-exact reference semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu import flat_config, ray_config, reset_from_seed
from gym_craftingworld_tpu.core import slots as sm
from gym_craftingworld_tpu.ops import packed_rollout as pr
from gym_craftingworld_tpu.ops import transposed_rollout as tr


def _scan_t(cfg, slots, actions):
    ts = tr.transpose_in(slots)

    def body(c, a):
        st, r = tr._step_t(cfg, c, a)
        return st, (r.reward, r.done, r.changed)

    return jax.lax.scan(body, ts, actions)


def _assert_equal_rollout(cfg, seed, B, T, key):
    slots = sm.from_env_state(reset_from_seed(cfg, seed, B))
    actions = jax.random.randint(key, (T, B), 0, 6, dtype=jnp.int32)

    ts_ref, (r_ref, d_ref, c_ref) = _scan_t(cfg, slots, actions)
    sl_p, out = pr.rollout_p(cfg, slots, actions, T)
    ts_p = tr.transpose_in(sl_p)

    np.testing.assert_array_equal(np.asarray(out.reward), np.asarray(r_ref))
    np.testing.assert_array_equal(np.asarray(out.done), np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(out.changed), np.asarray(c_ref))
    on = np.asarray(ts_ref.slot_stat) == sm.ON_GRID
    for f in ts_ref._fields:
        a, b = np.asarray(getattr(ts_ref, f)), np.asarray(getattr(ts_p, f))
        if f in ("slot_pos_r", "slot_pos_c"):
            # position of held/removed slots is representation-dependent
            np.testing.assert_array_equal(a[on], b[on], err_msg=f)
        else:
            np.testing.assert_array_equal(a, b, err_msg=f)


def test_packed_rollout_matches_scan():
    for cfg, seed in [(ray_config(), 0), (flat_config(), 1)]:
        _assert_equal_rollout(cfg, seed, 24, 400, jax.random.PRNGKey(5))


def test_packed_rollout_subset_reward():
    import dataclasses

    cfg = dataclasses.replace(ray_config(), reward_equal=False)
    _assert_equal_rollout(cfg, 2, 16, 300, jax.random.PRNGKey(9))


def test_packed_pack_unpack_roundtrip():
    cfg = ray_config()
    slots = sm.from_env_state(reset_from_seed(cfg, 7, 32))
    ts = tr.transpose_in(slots)
    p = pr.pack(cfg, ts)
    init_rows = (ts.init_pos_r, ts.init_pos_c, ts.init_type,
                 ts.init_agent_r, ts.init_agent_c)
    ts2 = pr.unpack(cfg, p, ts.desired, init_rows)
    for f in ts._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(ts, f)), np.asarray(getattr(ts2, f)), err_msg=f)


def test_packed_bench_checksum_matches_full_outputs():
    cfg = ray_config()
    slots = sm.from_env_state(reset_from_seed(cfg, 3, 16))
    key = jax.random.PRNGKey(11)
    sl_a, out = pr.rollout_p_random(cfg, slots, key, 200)
    sl_b, acc = pr.rollout_p_bench(cfg, slots, key, 200)
    assert int(np.asarray(out.reward).sum()) == int(acc)
    for f in ("slot_type", "slot_stat", "agent", "achieved", "step_num"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sl_a, f)), np.asarray(getattr(sl_b, f)),
            err_msg=f)


def test_packed_rollout_long_horizon_crafting_chain():
    """Drive an expert-like dense action mix so crafting effects actually fire."""
    cfg = ray_config()
    B, T = 32, 600
    slots = sm.from_env_state(reset_from_seed(cfg, 13, B))
    key = jax.random.PRNGKey(3)
    # bias towards moves with regular pickup/drop interleaving
    moves = jax.random.randint(key, (T, B), 0, 6, dtype=jnp.int32)
    step_idx = jnp.arange(T, dtype=jnp.int32)[:, None]
    actions = jnp.where(step_idx % 7 == 6, 4, jnp.where(step_idx % 11 == 10, 5,
                                                        moves % 4))
    ts_ref, (r_ref, d_ref, c_ref) = _scan_t(cfg, slots, actions)
    sl_p, out = pr.rollout_p(cfg, slots, actions, T)
    np.testing.assert_array_equal(np.asarray(out.reward), np.asarray(r_ref))
    np.testing.assert_array_equal(
        np.asarray(tr.transpose_in(sl_p).achieved), np.asarray(ts_ref.achieved))
    # sanity: at least some achieved bits latched during the run
    assert int(np.asarray(ts_ref.achieved).sum()) > 0


def test_unrolled_step_bit_identical():
    """`_step_p_unrolled` must equal `_step_p` field-for-field, every step,
    under a dense crafting-heavy action mix and both dtypes."""
    import dataclasses

    for cfg, seed, reward_equal in [
        (ray_config(), 0, True),
        (flat_config(), 1, True),
        (dataclasses.replace(ray_config(), reward_equal=False), 2, False),
    ]:
        B, T = 32, 500
        slots = sm.from_env_state(reset_from_seed(cfg, seed, B))
        ts = tr.transpose_in(slots)
        p0 = pr.pack(cfg, ts)
        moves = jax.random.randint(jax.random.PRNGKey(seed), (T, B), 0, 6,
                                   dtype=jnp.int32)
        step_idx = jnp.arange(T, dtype=jnp.int32)[:, None]
        actions = jnp.where(
            step_idx % 7 == 6, 4,
            jnp.where(step_idx % 11 == 10, 5, moves % 4)).astype(jnp.int16)

        for dtype in (jnp.int16, jnp.int32):
            cast = lambda s: jax.tree.map(lambda x: x.astype(dtype), s)

            def scan(step_fn):
                def body(c, a):
                    st, r = step_fn(cfg, c, a.astype(dtype), dtype=dtype)
                    return st, (r.reward, r.done, r.changed)

                return jax.jit(lambda p, a: jax.lax.scan(body, p, a))(
                    cast(p0), actions)

            pa, outs_a = scan(pr._step_p)
            pb, outs_b = scan(pr._step_p_unrolled)
            for f in pr.PackedState._fields:
                np.testing.assert_array_equal(
                    np.asarray(getattr(pa, f)), np.asarray(getattr(pb, f)),
                    err_msg=f"{f} dtype={dtype}")
            for name, a, b in zip(("reward", "done", "changed"), outs_a, outs_b):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b),
                    err_msg=f"{name} dtype={dtype}")


def test_long_rollout_past_int16_wrap_point():
    """Regression: step_num saturates at max_steps, so a no-reset rollout of
    T > 32767 stays semantically valid in int16 (done never un-sets, and the
    packed engine still matches the int32 transposed scan bit-for-bit)."""
    cfg = flat_config()
    B, T = 8, 33000
    slots = sm.from_env_state(reset_from_seed(cfg, 3, B))
    actions = jax.random.randint(jax.random.PRNGKey(11), (T, B), 0, 6,
                                 dtype=jnp.int32)

    ts_ref, (r_ref, d_ref, _) = _scan_t(cfg, slots, actions)
    sl_p, out = pr.rollout_p(cfg, slots, actions, T)

    d = np.asarray(out.done)
    assert d[cfg.max_steps - 1 :].all(), "done must stay latched past max_steps"
    np.testing.assert_array_equal(d, np.asarray(d_ref))
    np.testing.assert_array_equal(np.asarray(out.reward), np.asarray(r_ref))
    assert np.asarray(sl_p.step_num).max() == cfg.max_steps
    np.testing.assert_array_equal(
        np.asarray(sl_p.step_num), np.asarray(ts_ref.step_num)
    )
