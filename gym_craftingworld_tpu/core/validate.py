"""Debug-mode state invariant checking.

The reference's only data hazard is in-place numpy mutation (SURVEY §2.7);
the pure-functional core removes races by construction. What remains worth
checking is *semantic* state validity — the invariants every reachable state
satisfies and that the fast paths (slots, fused kernel) rely on:

  * exactly one agent position inside the grid
  * at most one object per cell
  * the held-item code is 0..3 and the agent holds at most one item
  * achieved/desired are 0/1 vectors
  * object multiset is conserved up to the crafting rules (counts never grow)

``assert_valid_state`` runs on host (numpy) and raises with the offending env
index; ``check_state`` returns a boolean mask for use in tests.
"""

from __future__ import annotations

import numpy as np

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.state import EnvState


def check_state(cfg: EnvConfig, state: EnvState) -> np.ndarray:
    """Per-env validity mask (True = all invariants hold)."""
    objects = np.asarray(state.objects)
    agent = np.asarray(state.agent)
    holding = np.asarray(state.holding)
    achieved = np.asarray(state.achieved)
    desired = np.asarray(state.desired)
    B = objects.shape[0]

    ok = np.ones(B, bool)
    ok &= (agent[:, 0] >= 0) & (agent[:, 0] < cfg.height)
    ok &= (agent[:, 1] >= 0) & (agent[:, 1] < cfg.width)
    ok &= (objects >= 0).all(axis=(1, 2)) & (objects <= C.N_OBJECTS).all(axis=(1, 2))
    ok &= (holding >= C.HOLD_NONE) & (holding <= C.HOLD_HAMMER)
    ok &= ((achieved == 0) | (achieved == 1)).all(axis=1)
    ok &= ((desired == 0) | (desired == 1)).all(axis=1)

    # object counts never grow: every object type appears at most twice
    # (a second sticks can exist after ChopTree), total on-grid + held <= 8
    for b in range(B):
        counts = np.bincount(objects[b].reshape(-1), minlength=C.N_OBJECTS + 1)[1:]
        total = counts.sum() + (1 if holding[b] else 0)
        if total > C.N_OBJECTS:
            ok[b] = False
    return ok


def assert_valid_state(cfg: EnvConfig, state: EnvState):
    ok = check_state(cfg, state)
    if not ok.all():
        bad = int(np.flatnonzero(~ok)[0])
        raise AssertionError(
            f"invalid env state at batch index {bad}: "
            f"agent={np.asarray(state.agent)[bad]}, "
            f"holding={int(np.asarray(state.holding)[bad])}"
        )
