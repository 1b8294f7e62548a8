"""Produce the BASELINE.md scaling artifact (docs/scaling.json).

Two sections:

* ``cpu_virtual8`` — scaling efficiency of the headline engines over an
  8-virtual-device CPU mesh (1 device vs 8), via parallel/mesh.scaling_report.
  Run with::

      XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
          python tools/scaling_artifact.py --cpu

* ``tpu_single_chip`` — absolute env-steps/s of the sharded packed scan and
  sharded fused bench kernel on silicon over a 1-device mesh, delta-timed
  (T vs T/2 so the ~35 ms axon relay round-trip cancels — bench.py method).
  Run with (TPU default backend)::

      python tools/scaling_artifact.py --tpu

Each invocation merges its section into docs/scaling.json.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "scaling.json")


def merge(section: str, payload: dict):
    doc = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            doc = json.load(f)
    doc[section] = payload
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=2, sort_keys=True)
    print(f"wrote {section} → {OUT}")


def run_cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.device_count() >= 8, (
        "run with XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    from gym_craftingworld_tpu.config import EnvConfig
    from gym_craftingworld_tpu.parallel.mesh import scaling_report

    cfg = EnvConfig(height=21, width=21, max_steps=300)
    rep = scaling_report(cfg, batch_per_device=512, num_steps=64,
                         engines=("grid", "packed_scan"), iters=5)
    merge("cpu_virtual8", {
        "config": {"batch_per_device": 512, "num_steps": 64,
                   "grid": "21x21", "devices": jax.device_count(),
                   "physical_cores": os.cpu_count()},
        "note": (
            "8 virtual XLA devices share this host's physical cores, so "
            "perfect per-device scaling is impossible by construction; the "
            "measurement validates that the sharded programs run and scale "
            "to the physical-core limit. Stepping is communication-free "
            "(no collectives in the rollout), so on real multi-chip "
            "hardware efficiency is linear by construction — see "
            "tpu_single_chip for silicon absolutes."
        ),
        "engines": rep,
    })
    for k, v in rep.items():
        print(f"  {k}: eff {v['efficiency']:.3f} "
              f"(1dev {v['n1']:.3g} → {v['devices']}dev "
              f"{v[f'n{v['devices']}']:.3g} env-steps/s)")


def _delta_rate(run, B, T, iters=7):
    """Delta-timed env-steps/s: extra T/2 steps / extra wall time."""
    def med(T):
        run(T)  # warm/compile
        ts = []
        for _ in range(iters):
            t0 = time.time()
            run(T)
            ts.append(time.time() - t0)
        return float(np.median(ts))

    t_full, t_half = med(T), med(T // 2)
    return B * (T - T // 2) / max(t_full - t_half, 1e-9)


def run_tpu():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(OUT), os.pardir, ".jax_cache"),
    )
    assert jax.devices()[0].platform == "tpu", "needs the TPU backend"
    from gym_craftingworld_tpu import ray_config, reset_from_seed
    from gym_craftingworld_tpu.core import slots as sm
    from gym_craftingworld_tpu.parallel import sharded_engine as se
    from gym_craftingworld_tpu.parallel.mesh import make_env_mesh

    cfg = ray_config()
    B = 16384
    mesh = make_env_mesh(1)
    slots = se.shard_slots(
        sm.from_env_state(reset_from_seed(cfg, 0, B)), mesh
    )

    def run_fused(T):
        _, acc = se.fused_rollout_packed_bench_sharded(
            cfg, slots, 3, T, mesh=mesh
        )
        # Host transfer, not block_until_ready: through the axon relay only a
        # device->host read truly waits for the computation (CLAUDE.md).
        return int(jnp.asarray(acc).sum())

    fused_rate = _delta_rate(run_fused, B, 131072)

    T_scan = 32768  # long T so fixed per-dispatch costs amortize (CLAUDE.md)
    slots2 = sm.from_env_state(reset_from_seed(cfg, 0, B))

    def run_scan(T):
        actions = jax.random.randint(
            jax.random.PRNGKey(2), (T, B), 0, 6, jnp.int32
        )
        _, out = se.rollout_p_sharded(cfg, slots2, actions, T, mesh)
        return int(out.reward.sum())  # host transfer = real sync (CLAUDE.md)

    scan_rate = _delta_rate(run_scan, B, T_scan)

    merge("tpu_single_chip", {
        "config": {"envs": B, "grid": "21x21", "mesh": "1-device shard_map",
                   "timing": "delta (T vs T/2, median of 7)"},
        "packed_scan_env_steps_per_s": scan_rate,
        "fused_bench_env_steps_per_s": fused_rate,
    })
    print(f"  packed_scan {scan_rate:.3g}  fused {fused_rate:.3g} env-steps/s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        run_cpu()
    if args.tpu:
        run_tpu()
    if not (args.cpu or args.tpu):
        print("pass --cpu and/or --tpu")
