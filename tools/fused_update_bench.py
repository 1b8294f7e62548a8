"""Standalone timing of the fused PPO-update kernel (ops/fused_update.py).

Delta-times K vs K/2 kernel calls in one jitted scan (relay constant
cancels) at the production minibatch shape, for a sweep of row-tile sizes.

    python tools/fused_update_bench.py [N_ROWS] [HIDDEN] [TILES...]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
H = int(sys.argv[2]) if len(sys.argv) > 2 else 512
TILES = [int(t) for t in sys.argv[3:]] or [1024]

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gym_craftingworld_tpu import ray_config  # noqa: E402
from gym_craftingworld_tpu.ops import fused_update as fu  # noqa: E402
from gym_craftingworld_tpu.train import fast_ppo as fp  # noqa: E402

cfg = ray_config()
fppo = fp.FastPPOConfig(hidden=H)
params = fp.init_params(jax.random.PRNGKey(0), cfg, fppo)
F = fp.feature_rows(cfg)
kb = jax.random.split(jax.random.PRNGKey(1), 6)
batch = (
    jax.random.normal(kb[0], (N, F), jnp.bfloat16),
    jax.random.randint(kb[1], (N,), 0, 6, jnp.int32),
    jnp.full((N,), -np.log(6.0), jnp.float32),
    jax.random.normal(kb[2], (N,), jnp.float32),
    jax.random.normal(kb[3], (N,), jnp.float32),
    jax.random.normal(kb[4], (N,), jnp.float32),
)


def sweep(tile):
    @partial(jax.jit, static_argnums=(0,))
    def many(n, key):
        def body(acc, k):
            # perturb adv so the call can't be CSEd/hoisted
            b = batch[:4] + (batch[4] + acc * 1e-9, batch[5])
            grads, aux = fu.fused_minibatch_grads(fppo, params, b, tile=tile)
            return acc + aux["loss"], None

        acc, _ = jax.lax.scan(body, key, None, length=n)
        return acc

    K = 48

    def best(n):
        float(many(n, jnp.float32(0.0)))  # compile+warm
        ts = []
        for i in range(3):
            t0 = time.time()
            float(many(n, jnp.float32(i)))
            ts.append(time.time() - t0)
        return min(ts)

    # absolute long-run difference (CLAUDE.md timing discipline: short delta
    # pairs are unstable through the relay; 48 calls ≈ 130ms of device time
    # amortizes the ~35ms constant, and the 48-24 difference removes it)
    tf, th = best(K), best(K // 2)
    ms = 1e3 * (tf - th) / (K - K // 2)
    # roofline: useful bf16 FLOPs of fwd+bwd+wgrad (3x forward FLOPs)
    flops = 6 * N * (F * H + H * H + H * 7)
    pct = flops / (ms * 1e-3) / 197e12 * 100
    print(f"tile={tile:5d}: {ms:6.3f} ms/call  ({pct:4.1f}% of v5e bf16 peak)")
    return ms


if __name__ == "__main__":
    print(f"N={N} F={F} H={H}")
    for t in TILES:
        try:
            sweep(t)
        except Exception as e:  # Mosaic shape-specific compile crashes
            print(f"tile={t:5d}: FAILED ({type(e).__name__}: {str(e)[:120]})")
