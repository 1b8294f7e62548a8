"""Snapshot demo pipeline: collection, feature-builder consistency, BC+DAgger.

Small grids keep everything CPU-fast; the scale path itself is exercised by
tools/train_canonical.py on the real 21x21 setting.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.config import EnvConfig
from gym_craftingworld_tpu.core.reset import reset_from_seed
from gym_craftingworld_tpu.core.rollout import rollout_random
from gym_craftingworld_tpu.models.grid_policy import (
    N_EXTRAS,
    N_PLANES,
    init_grid_policy,
    planes_from_snaps,
    planes_from_state,
    snap_columns_from_state,
)
from gym_craftingworld_tpu.train import dagger, demos


CFG = EnvConfig(height=8, width=8, max_steps=100)


def _mid_episode_state(seed=3, steps=37, batch=16):
    state = reset_from_seed(CFG, seed, batch)
    state, _ = rollout_random(CFG, state, jax.random.PRNGKey(seed), steps)
    return state


def test_device_snap_columns_match_host_extraction():
    state = _mid_episode_state()
    cols = jax.tree.map(np.asarray, snap_columns_from_state(CFG, state))
    B = state.objects.shape[0]
    flat = np.asarray(state.objects).reshape(B, -1)
    occ_key, occ_code = demos.occupancy_from_grids(flat, CFG.n_cells)
    init_key, init_agent_key = demos.init_keys_from_grids(
        np.asarray(state.init_objects).reshape(B, -1)
    )
    np.testing.assert_array_equal(cols["occ_key"], occ_key)
    np.testing.assert_array_equal(cols["occ_code"], occ_code)
    np.testing.assert_array_equal(cols["init_key"], init_key)
    np.testing.assert_array_equal(cols["init_agent_key"], init_agent_key)
    np.testing.assert_array_equal(
        cols["desired"], demos.bits_to_mask(np.asarray(state.desired))
    )
    np.testing.assert_array_equal(
        cols["achieved"], demos.bits_to_mask(np.asarray(state.achieved))
    )


def test_planes_from_snaps_match_planes_from_state():
    state = _mid_episode_state(seed=9, steps=55)
    cols = snap_columns_from_state(CFG, state)
    p_state, e_state = planes_from_state(CFG, state)
    p_snap, e_snap = planes_from_snaps(
        CFG, cols["occ_key"], cols["occ_code"], cols["init_key"],
        cols["init_agent_key"], cols["agent_key"], cols["holding"],
        cols["desired"], cols["achieved"],
    )
    assert p_state.shape == (16, 8, 8, N_PLANES)
    assert e_state.shape == (16, N_EXTRAS)
    np.testing.assert_array_equal(np.asarray(p_snap), np.asarray(p_state))
    np.testing.assert_array_equal(np.asarray(e_snap), np.asarray(e_state))


def test_grids_from_snaps_round_trip():
    state = _mid_episode_state(seed=5, steps=40)
    cols = jax.tree.map(np.asarray, snap_columns_from_state(CFG, state))
    n = len(cols["agent_key"])
    snaps = demos.SnapDataset(
        action=np.zeros(n, np.int8), episode=np.zeros(n, np.int32),
        **{k: cols[k] for k in dagger._COL_FIELDS},
    )
    objects, init_objects = demos.grids_from_snaps(CFG, snaps, np.arange(n))
    np.testing.assert_array_equal(objects, np.asarray(state.objects))
    np.testing.assert_array_equal(
        init_objects, np.asarray(state.init_objects)
    )


@pytest.fixture(scope="module")
def small_demos():
    return demos.collect_expert_demos(
        CFG, num_episodes=24, seed=0, noise_eps=0.1, batch=12
    )


def test_collect_expert_demos(small_demos):
    d = small_demos
    assert d.num_episodes >= 20  # expert solves essentially everything
    assert d.num_rows > 100
    assert set(np.unique(d.action)).issubset(set(range(C.N_ACTIONS)))
    assert (d.desired > 0).all()  # stacked draws pick >= 1 task
    # save/load round trip
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "d.npz")
        d.save(p)
        d2 = demos.SnapDataset.load(p)
        for k in demos.SnapDataset._fields:
            np.testing.assert_array_equal(getattr(d, k), getattr(d2, k))


def test_expert_relabel_reproduces_collected_labels(small_demos):
    """The expert is a deterministic function of the snapshot row: relabeling
    collected rows must reproduce the recorded labels exactly."""
    d = small_demos
    rows = np.random.RandomState(0).choice(d.num_rows, 64, replace=False)
    cols = {k: getattr(d, k)[rows] for k in dagger._COL_FIELDS}
    relabeled = dagger.expert_relabel(CFG, cols)
    np.testing.assert_array_equal(relabeled.action, d.action[rows])


def test_bc_train_and_dagger_smoke(small_demos):
    model, ts, hist = dagger.bc_train_snaps(
        CFG, small_demos, key=0, epochs=3, batch_size=256, channels=16,
        hidden=64,
    )
    assert hist[-1]["loss"] < hist[0]["loss"]
    res = dagger.evaluate_grid_policy(CFG, model, ts.params, num_episodes=8)
    assert 0.0 <= res["success_rate"] <= 1.0
    ts, dataset, info = dagger.dagger_round(
        CFG, model, ts, small_demos, round_idx=0, key=jax.random.PRNGKey(1),
        num_episodes=8, max_states=500, epochs=1, batch_size=256,
    )
    assert dataset.num_rows > small_demos.num_rows
    assert 0.0 <= info["rollout_success"] <= 1.0
