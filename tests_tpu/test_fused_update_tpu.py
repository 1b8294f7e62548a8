"""Compiled-Mosaic validation of the fused PPO-update kernel.

The CPU suite pins the kernel's gradient algebra in interpret mode
(tests/test_fused_update.py); this runs the same parity check through the
real Mosaic lowering at production shapes (hidden=512, multi-tile N).
"""

import jax
import numpy as np

from gym_craftingworld_tpu import ray_config
from gym_craftingworld_tpu.ops import fused_update as fu
from gym_craftingworld_tpu.train import fast_ppo as fp


def test_compiled_grads_match_autodiff():
    cfg = ray_config()
    fppo = fp.FastPPOConfig()
    params = fp.init_params(jax.random.PRNGKey(0), cfg, fppo)
    F = fp.feature_rows(cfg)
    n = 4 * fu.TILE
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    feat = (jax.random.uniform(ks[0], (n, F)) < 0.3).astype(jax.numpy.bfloat16)
    action = jax.random.randint(ks[1], (n,), 0, 6)
    old_lp = -jax.numpy.abs(jax.random.normal(ks[2], (n,))) - 0.5
    old_v = jax.random.normal(ks[3], (n,))
    adv = jax.random.normal(ks[4], (n,))
    ret = old_v + 0.5 * jax.random.normal(ks[5], (n,))
    batch = (feat, action, old_lp, old_v, adv, ret)

    def loss_fn(p):
        return fp._loss_bm(fppo, p, batch)

    (loss_ref, aux_ref), grads_ref = jax.value_and_grad(
        loss_fn, has_aux=True
    )(params)
    grads, aux = fu.fused_minibatch_grads(fppo, params, batch)

    np.testing.assert_allclose(float(aux["loss"]), float(loss_ref),
                               rtol=2e-3, atol=2e-4)
    for name in grads._fields:
        g = np.asarray(getattr(grads, name), np.float64)
        r = np.asarray(getattr(grads_ref, name), np.float64)
        cos = (g * r).sum() / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-12)
        assert cos > 0.999, f"{name}: cosine {cos:.5f}"
        err = np.abs(g - r).max() / max(np.abs(r).max(), 1e-6)
        assert err < 3e-2, f"{name}: rel err {err:.4f}"
