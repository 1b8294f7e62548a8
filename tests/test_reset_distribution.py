"""Distributional checks on fast-mode (jax.random) resets.

Fast mode deliberately uses a different bitstream from the reference, so
bit-parity is out of scope (that's the parity path). What must hold is the
*distribution*: the reference's diag-scatter + permutation shuffle places one
of each object + the agent on a uniformly random ordered 9-subset of cells
(craftingworld_ray.py:599-628); our ``top_k`` over iid uniforms must match.
"""

import numpy as np

from gym_craftingworld_tpu import EnvConfig, reset_from_seed
from gym_craftingworld_tpu import constants as C


def test_placement_marginals_uniform():
    """Each entity's cell is marginally uniform over the grid."""
    cfg = EnvConfig(height=4, width=4, max_steps=10)
    n = cfg.n_cells
    B = 6000
    st = reset_from_seed(cfg, 0, B)
    objects = np.asarray(st.objects).reshape(B, n)
    agent_lin = np.asarray(st.agent[:, 0]) * cfg.width + np.asarray(st.agent[:, 1])

    # agent marginal
    counts = np.bincount(agent_lin, minlength=n)
    expected = B / n
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # chi-square with 15 dof: 99.9th percentile ≈ 37.7
    assert chi2 < 45, f"agent placement non-uniform: chi2={chi2:.1f}"

    # each object's marginal
    for code in range(1, 9):
        pos = (objects == code).argmax(axis=1)
        counts = np.bincount(pos, minlength=n)
        chi2 = ((counts - expected) ** 2 / expected).sum()
        assert chi2 < 45, f"object {code} non-uniform: chi2={chi2:.1f}"


def test_all_entities_distinct_cells():
    cfg = EnvConfig(height=3, width=3, max_steps=10)
    B = 500
    st = reset_from_seed(cfg, 1, B)
    objects = np.asarray(st.objects)
    agent = np.asarray(st.agent)
    for b in range(B):
        assert (objects[b] > 0).sum() == 8
        assert objects[b, agent[b, 0], agent[b, 1]] == 0  # agent on the empty cell


def test_task_count_distribution():
    """stacking=True draws k ~ 1 + Uniform{0..n-1} tasks (craftingworld_ray.py:169)."""
    cfg = EnvConfig(height=5, width=5, max_steps=10)
    B = 6000
    st = reset_from_seed(cfg, 2, B)
    ks = np.asarray(st.desired).sum(axis=1)
    assert ks.min() >= 1 and ks.max() <= 9
    counts = np.bincount(ks, minlength=10)[1:10]
    expected = B / 9
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # chi-square with 8 dof: 99.9th percentile ≈ 26.1
    assert chi2 < 32, f"task-count non-uniform: chi2={chi2:.1f}"


def test_desired_goal_respects_selection():
    cfg = EnvConfig(
        height=5, width=5, max_steps=10,
        selected_task_indices=(1, 4, 7), number_of_tasks=3,
    )
    st = reset_from_seed(cfg, 3, 512)
    desired = np.asarray(st.desired)
    allowed = np.zeros(C.N_TASKS, np.int8)
    allowed[[1, 4, 7]] = 1
    assert (desired <= allowed[None]).all()
    assert (desired.sum(axis=1) >= 1).all()
