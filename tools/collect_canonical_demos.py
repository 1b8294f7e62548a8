"""Collect expert demonstrations at the canonical 21x21 stacked setting.

CPU process (the expert is a host planner; the lockstep env batch steps
through the jitted core on the CPU backend). Writes a SnapDataset npz.

    JAX_PLATFORMS=cpu python tools/collect_canonical_demos.py \
        --episodes 24000 --seed 0 --out demos_canonical.npz
"""

import argparse
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

from gym_craftingworld_tpu.config import EnvConfig  # noqa: E402
from gym_craftingworld_tpu.train.demos import collect_expert_demos  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=24000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--noise-eps", type=float, default=0.05)
    ap.add_argument("--batch", type=int, default=192)
    ap.add_argument("--out", default="demos_canonical.npz")
    args = ap.parse_args()

    cfg = EnvConfig(height=21, width=21, max_steps=300, stacking=True)
    t0 = time.time()

    def progress(done_batches, n_batches, kept):
        dt = time.time() - t0
        print(
            f"[{dt:7.1f}s] batch {done_batches}/{n_batches}, "
            f"{kept} episodes kept ({kept / dt:.1f} eps/s)",
            flush=True,
        )

    snaps = collect_expert_demos(
        cfg, args.episodes, seed=args.seed, noise_eps=args.noise_eps,
        batch=args.batch, progress=progress,
    )
    snaps.save(args.out)
    dt = time.time() - t0
    print(
        f"done: {snaps.num_episodes} episodes, {snaps.num_rows} rows "
        f"in {dt:.0f}s → {args.out}",
        flush=True,
    )


if __name__ == "__main__":
    main()
