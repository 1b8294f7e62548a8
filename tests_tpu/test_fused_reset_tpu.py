"""On-chip distribution validation of the fused world-pool kernel.

Runs only on real TPU (the interpreter stubs the PRNG). Pins that
ops/fused_reset.fresh_packed_fused draws the reference reset distribution:
uniform collision-free placement (craftingworld_ray.py:599-628) and the
k = randint(9)+1 shuffled task draw (:169-176).
"""

import numpy as np
import pytest

import jax

from gym_craftingworld_tpu import constants as C, ray_config
from gym_craftingworld_tpu.ops.fused_reset import BLOCK, fresh_packed_fused

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu", reason="requires real TPU"
)


def test_fused_reset_distribution_on_chip():
    cfg = ray_config()
    n = 8 * BLOCK
    p = fresh_packed_fused(cfg, 1234, n)
    slot_key = np.asarray(p.slot_key).astype(np.int64)
    agent_key = np.asarray(p.init_agent_key).astype(np.int64)
    HW = cfg.n_cells

    # distinct cells per env
    cells = np.concatenate([slot_key, agent_key[None]], axis=0)  # [9, n]
    sorted_cells = np.sort(cells, axis=0)
    assert (np.diff(sorted_cells, axis=0) > 0).all()

    # placement uniformity: each of the 9 draws individually uniform on HW.
    # agent_key marginal: chi^2 over 441 cells, n samples
    counts = np.bincount(agent_key, minlength=HW)
    expected = n / HW
    chi2 = ((counts - expected) ** 2 / expected).sum()
    # dof=440; mean 440, std ~30 — 6 sigma
    assert chi2 < 440 + 6 * np.sqrt(2 * 440), chi2

    # first slot marginal too (ordered pick 1 is uniform)
    counts0 = np.bincount(slot_key[0], minlength=HW)
    chi2_0 = ((counts0 - expected) ** 2 / expected).sum()
    assert chi2_0 < 440 + 6 * np.sqrt(2 * 440), chi2_0

    # task-count distribution: popcount(desired) uniform on 1..9
    des = np.asarray(p.desired).astype(np.int64) & 0x1FF
    pop = np.array([bin(d).count("1") for d in des])
    hist = np.bincount(pop, minlength=10)[1:10]
    exp_k = n / 9
    chi2_k = ((hist - exp_k) ** 2 / exp_k).sum()
    assert chi2_k < 8 + 6 * np.sqrt(16), (hist, chi2_k)

    # per-task marginal: each task desired with the same frequency
    bits = (des[:, None] >> np.arange(9)[None, :]) & 1
    freq = bits.mean(0)
    assert np.abs(freq - freq.mean()).max() < 0.02, freq

    # two seeds diverge, same seed repeats
    p2 = fresh_packed_fused(cfg, 1234, n)
    np.testing.assert_array_equal(np.asarray(p2.slot_key), slot_key)
    p3 = fresh_packed_fused(cfg, 99, n)
    assert not np.array_equal(np.asarray(p3.slot_key), slot_key)
