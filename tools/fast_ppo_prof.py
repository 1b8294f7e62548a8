"""Per-phase timing breakdown of the fast-PPO update (VERDICT r2 item 2).

Each phase runs as its own jitted K-iteration scan and is delta-timed
(K vs K/2) so the ~35 ms axon relay constant cancels. Phases:

  pool     — fresh_packed_batch(2B): world + task sampling for auto-reset
  collect  — rollout scan (policy fwd + packed step + autoreset + storage)
  gae      — last_value + advantage scan
  update   — block shuffle + epochs x minibatches of grads + adam
  full     — train_step_fast (everything, = train_many_fast body)

    python tools/fast_ppo_prof.py [ENVS] [K]
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
K = int(sys.argv[2]) if len(sys.argv) > 2 else 12

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from gym_craftingworld_tpu import ray_config  # noqa: E402
from gym_craftingworld_tpu.train import fast_ppo as fp  # noqa: E402

cfg = ray_config()
fppo = fp.FastPPOConfig()
key = jax.random.PRNGKey(0)
ts = fp.init_fast_train_state(key, cfg, fppo)
env = fp.fresh_packed_batch(cfg, jax.random.fold_in(key, 1), B)
pool = fp.fresh_packed_batch(cfg, jax.random.fold_in(key, 2), 2 * B)


@partial(jax.jit, static_argnums=(0,))
def prof_pool(n, key):
    def body(acc, k):
        p = fp.fresh_packed_batch(cfg, k, 2 * B)
        return acc + p.agent_r.astype(jnp.int32).sum(), None

    acc, _ = jax.lax.scan(body, jnp.int32(0), jax.random.split(key, n))
    return acc


@partial(jax.jit, static_argnums=(0,))
def prof_collect(n, params, env, key):
    def body(carry, k):
        env, acc = carry
        env, traj = fp._collect(cfg, fppo, params, env, pool, k)
        return (env, acc + traj.raw_reward.sum()), None

    (env, acc), _ = jax.lax.scan(
        body, (env, jnp.int32(0)), jax.random.split(key, n)
    )
    return acc


@partial(jax.jit, static_argnums=(0,))
def prof_collect_nopolicy(n, env, key):
    """Collect with constant logits: isolates engine+autoreset from the MLP."""

    def body(carry, k):
        env, acc = carry

        def step(st, inp):
            k_act, t = inp
            action, _ = fp._sample_action(
                k_act, jnp.zeros((6, B), jnp.float32)
            )
            st2, res = fp._step_p_unrolled(cfg, st, action.astype(jnp.int16))
            off = (t * jnp.int32(12007)) % jnp.int32(B)
            st2 = fp._autoreset(st2, fp._pool_slice(pool, off, B), res.done)
            return st2, res.reward

        keys = jax.random.split(k, fppo.rollout_steps)
        steps = jnp.arange(fppo.rollout_steps, dtype=jnp.int32)
        env, rews = jax.lax.scan(step, env, (keys, steps))
        return (env, acc + rews.sum()), None

    (env, acc), _ = jax.lax.scan(
        body, (env, jnp.int32(0)), jax.random.split(key, n)
    )
    return acc


def _one_traj(params, env, k):
    _, traj = fp._collect(cfg, fppo, params, env, pool, k)
    last_value = fp.apply_policy(params, fp.features(cfg, env))[1]
    return traj, last_value


@partial(jax.jit, static_argnums=(0,))
def prof_gae(n, traj, last_value):
    def body(acc, _):
        adv, ret = fp._gae(fppo, traj, last_value)
        return acc + adv.sum() + ret.sum(), None

    acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
    return acc


@partial(jax.jit, static_argnums=(0,))
def prof_update(n, ts, traj, last_value, key):
    """The whole post-collect phase: GAE + shuffle + epochs, n times
    (the shared fast_ppo._update_phase, batch-major activations)."""

    def body(carry, k):
        ts, acc = carry
        adv, ret = fp._gae(fppo, traj, last_value)
        params, opt_state, losses, _ = fp._update_phase(
            fppo, ts, traj, adv, ret, k
        )
        return (fp.FastTrainState(params, opt_state, ts.update_idx),
                acc + losses.sum()), None

    (ts, acc), _ = jax.lax.scan(body, (ts, jnp.float32(0)),
                                jax.random.split(key, n))
    return acc


def delta_time(label, fn, *args, iters=5):
    """median(t(K)) - median(t(K/2)) per extra iteration."""
    def med(n):
        float(fn(n, *args))  # warm/compile
        ts_ = []
        for _ in range(iters):
            t0 = time.time()
            float(fn(n, *args))
            ts_.append(time.time() - t0)
        ts_.sort()
        return ts_[len(ts_) // 2]

    t_full, t_half = med(K), med(K // 2)
    ms = 1e3 * (t_full - t_half) / (K - K // 2)
    print(f"{label:>14}: {ms:7.2f} ms/iter")
    return ms


if __name__ == "__main__":
    print(f"B={B} rollout_steps={fppo.rollout_steps} hidden={fppo.hidden} "
          f"epochs={fppo.update_epochs} minibatches={fppo.num_minibatches}")
    traj, last_value = jax.jit(_one_traj)(ts.params, env, key)
    jax.block_until_ready(traj.feat)

    t_pool = delta_time("pool", prof_pool, key)
    t_col = delta_time("collect", prof_collect, ts.params, env, key)
    t_eng = delta_time("collect-noMLP", prof_collect_nopolicy, env, key)
    t_gae = delta_time("gae", prof_gae, traj, last_value)
    t_upd = delta_time("gae+update", prof_update, ts, traj, last_value, key)

    @partial(jax.jit, static_argnums=(0,))
    def prof_full(n, ts, env, key):
        ts, env, key, metrics = fp.train_many_fast(cfg, fppo, ts, env, n, key)
        return metrics["loss"][-1]

    t_full = delta_time("FULL step", prof_full, ts, env, key)
    steps = B * fppo.rollout_steps
    print(f"\nfull-loop: {steps / t_full * 1e3:.3e} env-steps/s "
          f"(collect alone {steps / t_col * 1e3:.3e}; "
          f"engine-only {steps / t_eng * 1e3:.3e})")
    print(f"accounted: pool {t_pool:.1f} + collect {t_col:.1f} + "
          f"update {t_upd:.1f} = {t_pool + t_col + t_upd:.1f} "
          f"vs full {t_full:.1f} ms")
