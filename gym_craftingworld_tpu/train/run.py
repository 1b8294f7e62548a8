"""PPO training driver.

Usage:
  python -m gym_craftingworld_tpu.train.run --envs 4096 --updates 200 \\
      --size 8 --max-steps 100 --ckpt-dir /tmp/cw_ckpt

Runs the fully-jitted train_step in a loop, logs throughput and skill metrics,
checkpoints with orbax, and shards the env batch over all visible devices.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--envs", type=int, default=4096)
    p.add_argument("--updates", type=int, default=100)
    p.add_argument("--size", type=int, default=8)
    p.add_argument("--max-steps", type=int, default=100)
    p.add_argument("--rollout-steps", type=int, default=64)
    p.add_argument("--hidden", type=int, default=512)
    p.add_argument("--policy", type=str, default="mlp",
                   choices=["mlp", "cnn", "vit"],
                   help="model family (recurrent training: train/ppo_rnn.py)")
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-dir", type=str, default="")
    p.add_argument("--ckpt-every", type=int, default=50)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest step_* checkpoint in "
                        "--ckpt-dir; continuation is bit-identical to an "
                        "uninterrupted run (tests/test_resume.py)")
    p.add_argument("--log-every", type=int, default=10)
    p.add_argument("--eval-every", type=int, default=0,
                   help="greedy-eval cadence in updates (0 = off)")
    p.add_argument("--eval-episodes", type=int, default=256)
    p.add_argument("--single-task", type=str, default="",
                   help="restrict goals to one named task (e.g. EatBread)")
    args = p.parse_args(argv)

    import jax

    # honor an explicit JAX_PLATFORMS even where a sitecustomize re-pins the
    # platform at interpreter start (the sandbox's axon relay does)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from gym_craftingworld_tpu import constants as C
    from gym_craftingworld_tpu.config import EnvConfig, resolve_selected_tasks
    from gym_craftingworld_tpu.parallel.mesh import (
        make_env_mesh,
        replicated,
        reset_sharded,
    )
    from gym_craftingworld_tpu.train.ppo import (
        PPOConfig,
        init_train_state,
        train_step,
    )

    cfg_kw = dict(
        height=args.size, width=args.size, max_steps=args.max_steps
    )
    if args.single_task:
        cfg_kw.update(
            selected_task_indices=resolve_selected_tasks([args.single_task]),
            number_of_tasks=1,
            stacking=False,
        )
    cfg = EnvConfig(**cfg_kw)
    ppo = PPOConfig(
        rollout_steps=args.rollout_steps, hidden=args.hidden, lr=args.lr,
        policy=args.policy,
    )

    mesh = make_env_mesh()
    env_state = reset_sharded(cfg, args.seed, args.envs, mesh)
    ts = init_train_state(jax.random.PRNGKey(args.seed), cfg, ppo)
    ts = jax.device_put(ts, replicated(mesh))
    key = jax.device_put(jax.random.PRNGKey(args.seed + 1), replicated(mesh))

    start_u = 0
    if args.resume:
        from gym_craftingworld_tpu.train import checkpoint

        if not args.ckpt_dir:
            raise SystemExit("--resume requires --ckpt-dir")
        ckpt_root = os.path.abspath(args.ckpt_dir)
        steps = sorted(
            int(d.split("_", 1)[1])
            for d in os.listdir(ckpt_root)
            if d.startswith("step_") and d.split("_", 1)[1].isdigit()
        )
        if not steps:
            raise SystemExit(f"--resume: no step_* checkpoints in {ckpt_root}")
        path = os.path.join(ckpt_root, f"step_{steps[-1]}")
        template = checkpoint._as_ckpt(ts, env_state, key, 0)
        restored = checkpoint.restore(path, template)
        ts = type(ts)(**restored["train_state"])
        env_state = restored["env_state"]
        key = restored["key"]
        start_u = int(restored["step"])
        # restore() materialises on default devices; re-lay-out over the mesh
        from gym_craftingworld_tpu.parallel.mesh import env_sharding

        env_state = jax.device_put(env_state, env_sharding(mesh))
        ts = jax.device_put(ts, replicated(mesh))
        key = jax.device_put(key, replicated(mesh))
        print(json.dumps({"resumed_from": path, "update": start_u}),
              flush=True)

    from gym_craftingworld_tpu.utils.profiling import Throughput, trace

    steps_per_update = args.envs * ppo.rollout_steps
    tput = Throughput()
    t_start = time.time()
    last_log_t, last_log_u = None, 0
    for u in range(start_u, args.updates):
        with trace("train_step"):
            ts, env_state, key, metrics = train_step(cfg, ppo, ts, env_state, key)
        tput.tick(steps_per_update)
        if u % args.log_every == 0 or u == args.updates - 1:
            # force completion before timing: dispatch is async, so rate is
            # measured over the wall time between log points
            m = {k: float(v) for k, v in metrics.items()}
            now = time.time()
            if last_log_t is not None and u > last_log_u:
                rate = steps_per_update * (u - last_log_u) / (now - last_log_t)
                m["env_steps_per_s"] = round(rate)
            last_log_t, last_log_u = now, u
            m.update(update=u, wall_s=round(now - t_start, 1))
            print(json.dumps(m), flush=True)
        if args.eval_every and (u + 1) % args.eval_every == 0:
            from gym_craftingworld_tpu.train.evaluate import evaluate_policy

            report = evaluate_policy(
                cfg, ppo, ts.params, args.eval_episodes, seed=args.seed + u
            )
            report["update"] = u
            print(json.dumps({"eval": report}), flush=True)
        if args.ckpt_dir and (u + 1) % args.ckpt_every == 0:
            from gym_craftingworld_tpu.train import checkpoint

            path = os.path.join(os.path.abspath(args.ckpt_dir), f"step_{u + 1}")
            checkpoint.save(path, ts, env_state, key, step=u + 1)
            print(json.dumps({"checkpoint": path}), flush=True)


if __name__ == "__main__":
    main()
