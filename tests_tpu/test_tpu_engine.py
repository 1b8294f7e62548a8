"""Headline-engine validation on real TPU silicon.

The CPU suite proves the fused packed kernel's *algebra* (interpret mode,
tests/test_packed_fused.py) but interpret mode stubs the hardware PRNG and
runs at a monkeypatched block size. This suite closes both gaps on the chip:

1. compiled-Mosaic equivalence of ``fused_rollout_packed`` against the packed
   scan engine at the production BLOCK (2048), on matched action streams;
2. the bench kernel's in-kernel PRNG action stream (the distribution behind
   the headline number): uniform over the 6 actions, divergent across seeds,
   and independent across grid blocks;
3. bench-kernel checksum determinism and seed divergence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu import ray_config, reset_from_seed
from gym_craftingworld_tpu.core import slots as sm
from gym_craftingworld_tpu.ops import packed_fused as pf
from gym_craftingworld_tpu.ops import packed_rollout as pr


def test_fused_equals_scan_on_chip():
    """Production-BLOCK compiled kernel == packed scan, bit for bit."""
    assert pf.BLOCK == 2048, "validate the production block size"
    cfg = ray_config()
    B, T = 4096, 256  # two grid blocks
    st = reset_from_seed(cfg, 0, B)
    sl = sm.from_env_state(st)
    actions = jax.random.randint(jax.random.PRNGKey(3), (T, B), 0, 6, jnp.int32)

    sl_fused, rewards_f, dones_f = pf.fused_rollout_packed(cfg, sl, actions, T)
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


def test_action_stream_uniform():
    """Per-action frequencies of the hardware PRNG stream ≈ 1/6.

    N = 2M draws → binomial sigma on a frequency is ~2.6e-4; the 2e-3
    tolerance is ~7.5 sigma, while any real defect (a stuck block, a biased
    modulo decode) shows up at the 1e-2 level or worse.
    """
    acts = np.asarray(pf.fused_action_stream(2048, 12345, 1024)).ravel()
    assert acts.min() >= 0 and acts.max() <= 5
    freq = np.bincount(acts, minlength=6) / acts.size
    np.testing.assert_allclose(freq, 1 / 6, atol=2e-3)


def test_action_stream_seed_divergence():
    a1 = np.asarray(pf.fused_action_stream(2048, 1, 256))
    a2 = np.asarray(pf.fused_action_stream(2048, 2, 256))
    # different seeds ⇒ different streams (agreement only by 1/6 chance)
    agree = (a1 == a2).mean()
    assert 0.05 < agree < 0.30, f"streams suspiciously correlated: {agree}"


def test_action_stream_block_independence():
    """Two grid blocks (seeded seed+0 / seed+1) must draw distinct streams."""
    B = 2 * pf.BLOCK
    acts = np.asarray(pf.fused_action_stream(B, 777, 256))
    blk0, blk1 = acts[:, : pf.BLOCK], acts[:, pf.BLOCK :]
    agree = (blk0 == blk1).mean()
    assert 0.05 < agree < 0.30, f"blocks share a stream: {agree}"
    # and block 1's stream equals a fresh single-block run seeded 777+1
    solo = np.asarray(pf.fused_action_stream(pf.BLOCK, 778, 256))
    np.testing.assert_array_equal(blk1, solo)


def test_bench_checksum_deterministic_and_seed_divergent():
    cfg = ray_config()
    B, T = 4096, 512
    sl = sm.from_env_state(reset_from_seed(cfg, 1, B))
    _, c1 = pf.fused_rollout_packed_bench(cfg, sl, 7, T)
    _, c1b = pf.fused_rollout_packed_bench(cfg, sl, 7, T)
    _, c2 = pf.fused_rollout_packed_bench(cfg, sl, 8, T)
    assert int(c1) == int(c1b)
    assert int(c1) != int(c2), "different seeds produced identical checksums"


def test_sharded_fused_on_chip_single_device_mesh():
    """Compiled Mosaic + shard_map composition at production BLOCK.

    The CPU suite exercises the sharded fused kernels only in interpret mode
    with BLOCK monkeypatched to 128 (tests/test_sharded_engine.py); this runs
    the same wrappers on silicon over a 1-device mesh at BLOCK=2048 and pins
    them to the unsharded kernel bit for bit.
    """
    from gym_craftingworld_tpu.parallel import sharded_engine as se
    from gym_craftingworld_tpu.parallel.mesh import make_env_mesh

    assert pf.BLOCK == 2048
    cfg = ray_config()
    mesh = make_env_mesh(1)
    B, T = 4096, 128  # two grid blocks through one shard

    sl = sm.from_env_state(reset_from_seed(cfg, 4, B))
    actions = jax.random.randint(jax.random.PRNGKey(6), (T, B), 0, 6, jnp.int32)
    sl_ref, rew_ref, done_ref = pf.fused_rollout_packed(cfg, sl, actions, T)
    sl_sh, rew_sh, done_sh = se.fused_rollout_packed_sharded(
        cfg,
        se.shard_slots(sm.from_env_state(reset_from_seed(cfg, 4, B)), mesh),
        actions, T, mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(rew_sh), np.asarray(rew_ref))
    np.testing.assert_array_equal(np.asarray(done_sh), np.asarray(done_ref))
    for f in ["slot_type", "slot_stat", "agent", "achieved", "step_num"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(sl_sh, f)), np.asarray(getattr(sl_ref, f)),
            err_msg=f,
        )

    # bench kernel: the per-shard seed layout must reproduce the unsharded
    # block-seed assignment (checksum + final state equality)
    st_ref, acc_ref = pf.fused_rollout_packed_bench(
        cfg, sm.from_env_state(reset_from_seed(cfg, 5, B)), 11, T)
    st_sh, acc_sh = se.fused_rollout_packed_bench_sharded(
        cfg,
        se.shard_slots(sm.from_env_state(reset_from_seed(cfg, 5, B)), mesh),
        11, T, mesh=mesh,
    )
    assert int(acc_sh) == int(acc_ref)
    np.testing.assert_array_equal(np.asarray(st_sh.agent),
                                  np.asarray(st_ref.agent))
    np.testing.assert_array_equal(np.asarray(st_sh.achieved),
                                  np.asarray(st_ref.achieved))
