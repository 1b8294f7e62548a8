"""Demo: roll a random policy for one episode and save it as a GIF
(reference `renders/` pipeline, SURVEY §2.3 row 18)."""

import numpy as np

from gym_craftingworld_tpu.api import make


def main():
    env = make("craftingworldflat-v3", seed=0, max_steps=40,
               render_save_rate=1)
    env.allow_gif_storage()
    env.reset()
    rng = np.random.RandomState(0)
    done = False
    while not done:
        _, _, done, _ = env.step(int(rng.randint(6)))
    env.reset()  # flushes the recorded episode to renders/env{id}/
    print(f"episode saved under renders/env{env.env_id}/")


if __name__ == "__main__":
    main()
