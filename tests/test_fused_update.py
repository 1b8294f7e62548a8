"""Gradient parity of the fused PPO-update kernel vs autodiff.

ops/fused_update.py hand-derives the backward pass of
train/fast_ppo._loss_bm inside one Pallas kernel. These tests pin it against
`jax.value_and_grad` of the reference implementation on random minibatches
(interpret mode on the CPU suite; tests_tpu/ runs the compiled Mosaic
version). Tolerances reflect bf16 operands with f32 accumulation under a
different (tile-local) reduction order.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gym_craftingworld_tpu import flat_config
from gym_craftingworld_tpu.ops import fused_update as fu
from gym_craftingworld_tpu.train import fast_ppo as fp


def _random_batch(key, n, F, realistic=True):
    ks = jax.random.split(key, 6)
    feat = (jax.random.uniform(ks[0], (n, F)) < 0.3).astype(jnp.bfloat16)
    action = jax.random.randint(ks[1], (n,), 0, 6)
    old_lp = -jnp.abs(jax.random.normal(ks[2], (n,))) - 0.5
    old_v = jax.random.normal(ks[3], (n,))
    adv = jax.random.normal(ks[4], (n,))
    ret = old_v + 0.5 * jax.random.normal(ks[5], (n,))
    return (feat, action, old_lp, old_v, adv, ret)


def _autodiff(fppo, params, batch):
    feat, action, old_lp, old_v, adv, ret = batch
    adv_n_in = adv  # _loss_bm normalizes internally

    def loss_fn(p):
        return fp._loss_bm(fppo, p, batch)

    (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    return loss, aux, grads


def test_fused_grads_match_autodiff():
    cfg = flat_config()
    fppo = fp.FastPPOConfig(hidden=128)
    params = fp.init_params(jax.random.PRNGKey(0), cfg, fppo)
    F = fp.feature_rows(cfg)
    n = 2 * fu.TILE
    batch = _random_batch(jax.random.PRNGKey(1), n, F)

    loss_ref, aux_ref, grads_ref = _autodiff(fppo, params, batch)
    grads, aux = fu.fused_minibatch_grads(fppo, params, batch, interpret=True)

    np.testing.assert_allclose(float(aux["loss"]), float(loss_ref),
                               rtol=2e-3, atol=2e-4)
    for k in ("pg_loss", "v_loss", "entropy"):
        np.testing.assert_allclose(float(aux[k]), float(aux_ref[k]),
                                   rtol=2e-3, atol=2e-4)
    for name in grads._fields:
        g = np.asarray(getattr(grads, name), np.float64)
        r = np.asarray(getattr(grads_ref, name), np.float64)
        scale = max(np.abs(r).max(), 1e-6)
        err = np.abs(g - r).max() / scale
        assert err < 3e-2, f"{name}: rel err {err:.4f}"
        # direction must agree tightly where it matters for the optimizer
        cos = (g * r).sum() / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-12)
        assert cos > 0.999, f"{name}: cosine {cos:.5f}"


def test_fused_grads_unaligned_rows_match_autodiff():
    """N not a multiple of TILE takes the auto-pad path: identical math.

    The padded rows must contribute exact zeros — grads and losses equal the
    aligned computation on the true rows.
    """
    cfg = flat_config()
    fppo = fp.FastPPOConfig(hidden=128)
    params = fp.init_params(jax.random.PRNGKey(4), cfg, fppo)
    F = fp.feature_rows(cfg)
    for n in (fu.TILE + 640, 700):  # pad-to-2-tiles and sub-tile cases
        batch = _random_batch(jax.random.PRNGKey(5), n, F)
        loss_ref, aux_ref, grads_ref = _autodiff(fppo, params, batch)
        grads, aux = fu.fused_minibatch_grads(fppo, params, batch,
                                              interpret=True)
        np.testing.assert_allclose(float(aux["loss"]), float(loss_ref),
                                   rtol=2e-3, atol=2e-4)
        for name in grads._fields:
            g = np.asarray(getattr(grads, name), np.float64)
            r = np.asarray(getattr(grads_ref, name), np.float64)
            scale = max(np.abs(r).max(), 1e-6)
            assert np.abs(g - r).max() / scale < 3e-2, (n, name)
            cos = (g * r).sum() / (
                np.linalg.norm(g) * np.linalg.norm(r) + 1e-12)
            assert cos > 0.999, (n, name, cos)


def test_fused_kernel_end_to_end_curve(monkeypatch):
    """Small-scale version of tools/fused_update_e2e.py: training through
    the kernel reaches the same policy as training through autodiff.

    Same seeds, 24 updates on single-task 8x8; the two runs' success
    trajectories must agree within the run-to-run noise band (they share all
    RNG, so remaining differences are exactly kernel-vs-autodiff numerics).
    """
    _orig = fu.fused_minibatch_grads
    monkeypatch.setattr(
        fu, "fused_minibatch_grads",
        lambda fppo, params, batch: _orig(fppo, params, batch, True),
    )
    _orig_idx = fu.fused_minibatch_grads_indexed
    monkeypatch.setattr(
        fu, "fused_minibatch_grads_indexed",
        lambda fppo, params, featb, ids, rest: _orig_idx(
            fppo, params, featb, ids, rest, interpret=True),
    )
    cfg = dataclasses.replace(flat_config(), stacking=False)
    fppo = fp.FastPPOConfig(rollout_steps=16, num_minibatches=2,
                            update_epochs=1, hidden=64)
    B, n_updates = 256, 24

    def train(use_fused):
        ts = fp.init_fast_train_state(jax.random.PRNGKey(10), cfg, fppo)
        env = fp.fresh_packed_batch(cfg, jax.random.PRNGKey(11), B)
        key = jax.random.PRNGKey(12)
        curve = []
        for _ in range(n_updates):
            key, k_pool, k_roll, k_perm = jax.random.split(key, 4)
            pool = fp.fresh_packed_batch(cfg, k_pool, 2 * B)
            env, traj = fp._collect(cfg, fppo, ts.params, env, pool, k_roll)
            _, last_value = fp.apply_policy(ts.params, fp.features(cfg, env))
            adv, ret = fp._gae(fppo, traj, last_value)
            params, opt_state, losses, _ = fp._update_phase(
                fppo, ts, traj, adv, ret, k_perm, use_fused_kernel=use_fused)
            ts = fp.FastTrainState(params, opt_state, ts.update_idx + 1)
            curve.append(float(
                (traj.raw_reward == cfg.max_steps).sum() / traj.action.size))
        return np.asarray(curve), ts

    curve_k, ts_k = train(True)
    curve_a, ts_a = train(False)
    # same-seed runs: curves must track closely; final tail within noise
    tail_k, tail_a = curve_k[-8:].mean(), curve_a[-8:].mean()
    band = max(0.25 * max(tail_k, tail_a, 1e-3), 0.01)
    assert abs(tail_k - tail_a) <= band, (tail_k, tail_a)
    assert np.isfinite(curve_k).all() and np.isfinite(curve_a).all()


def test_fused_grads_in_train_shapes():
    """The exact (hidden=512) production shapes at a reduced row count."""
    from gym_craftingworld_tpu import ray_config

    cfg = ray_config()
    fppo = fp.FastPPOConfig()
    params = fp.init_params(jax.random.PRNGKey(2), cfg, fppo)
    F = fp.feature_rows(cfg)
    batch = _random_batch(jax.random.PRNGKey(3), fu.TILE, F)
    grads, aux = fu.fused_minibatch_grads(fppo, params, batch, interpret=True)
    _, aux_ref, grads_ref = _autodiff(fppo, params, batch)
    g = np.asarray(grads.w2, np.float64)
    r = np.asarray(grads_ref.w2, np.float64)
    cos = (g * r).sum() / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-12)
    assert cos > 0.999
    assert np.isfinite(float(aux["loss"]))


def test_indexed_grads_match_plain_gather():
    """fused_minibatch_grads_indexed (in-kernel permuted-block gather) must
    equal fused_minibatch_grads on the explicitly gathered batch — the
    index-map DMA sequence is the shuffle, nothing else may change."""
    import numpy as np

    from gym_craftingworld_tpu import ray_config
    from gym_craftingworld_tpu.ops import fused_update as fu
    from gym_craftingworld_tpu.train import fast_ppo as fp

    cfg = ray_config()
    fppo = fp.FastPPOConfig(hidden=64)
    params = fp.init_params(jax.random.PRNGKey(0), cfg, fppo)
    F = fp.feature_rows(cfg)
    NB, BLK, nbm = 8, 256, 4
    kb = jax.random.split(jax.random.PRNGKey(1), 6)
    featb = jax.random.normal(kb[0], (NB, BLK, F), jnp.bfloat16)
    ids = jnp.asarray([5, 0, 3, 6], jnp.int32)
    N = nbm * BLK
    rest = (
        jax.random.randint(kb[1], (N,), 0, 6, jnp.int32),
        jax.random.normal(kb[2], (N,), jnp.float32),
        jax.random.normal(kb[3], (N,), jnp.float32),
        jax.random.normal(kb[4], (N,), jnp.float32),
        jax.random.normal(kb[5], (N,), jnp.float32),
    )
    g_idx, aux_idx = fu.fused_minibatch_grads_indexed(
        fppo, params, featb, ids, rest, interpret=True)
    batch = (featb[ids].reshape(N, F),) + rest
    g_ref, aux_ref = fu.fused_minibatch_grads(
        fppo, params, batch, True, tile=BLK)
    for a, b in zip(jax.tree.leaves(g_idx), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(aux_idx["loss"]), float(aux_ref["loss"]),
                               rtol=1e-6)
