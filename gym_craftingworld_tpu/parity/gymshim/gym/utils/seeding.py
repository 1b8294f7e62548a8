"""Legacy RandomState-based seeding (gym<=0.19 style).

The reference calls ``self.np_random.randint`` / ``.shuffle`` throughout
(craftingworld_ray.py:169-176, 599-628, 220-299), which requires the
RandomState API. Deterministic scheme: ``RandomState(seed)`` directly — the
parity harness seeds both the oracle (through this function) and its own
host-side RNG mirror identically, so the exact hashing scheme of historical
gym is irrelevant as long as both sides share this one.
"""

from __future__ import annotations

import numpy as np


def np_random(seed=None):
    if seed is not None and not (isinstance(seed, int) and seed >= 0):
        raise ValueError(f"Seed must be a non-negative integer, got {seed!r}")
    if seed is None:
        seed = int(np.random.SeedSequence().entropy % (2**31))
    rng = np.random.RandomState(seed)
    return rng, seed
