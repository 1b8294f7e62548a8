"""Structural invariants of the fused world-pool kernel (interpret mode).

The TPU interpreter stubs prng_random_bits to zeros, so distribution checks
live in tests_tpu/test_fused_reset_tpu.py; here we pin layout/invariants:
distinct placement cells, valid key ranges, correct PackedState assembly.
"""

import numpy as np

from gym_craftingworld_tpu import constants as C, ray_config
from gym_craftingworld_tpu.ops.fused_reset import BLOCK, fresh_packed_fused


def test_fused_reset_invariants_interpret():
    cfg = ray_config()
    n = BLOCK
    p = fresh_packed_fused(cfg, 3, n, interpret=True)

    slot_key = np.asarray(p.slot_key)  # [8, n]
    agent_key = np.asarray(p.init_agent_key)
    HW = cfg.n_cells

    assert slot_key.shape == (C.N_OBJECTS, n)
    assert (slot_key >= 0).all() and (slot_key < HW).all()
    assert (agent_key >= 0).all() and (agent_key < HW).all()
    # the 9 placement cells are distinct per env
    cells = np.concatenate([slot_key, agent_key[None]], axis=0)
    for b in range(0, n, 97):
        assert len(set(cells[:, b].tolist())) == C.N_OBJECTS + 1

    # agent coords consistent with the key
    np.testing.assert_array_equal(np.asarray(p.agent_r),
                                  agent_key // cfg.width)
    np.testing.assert_array_equal(np.asarray(p.agent_c),
                                  agent_key % cfg.width)

    des = np.asarray(p.desired).astype(np.int64)
    assert (des >= 1).all() and (des < 2**C.N_TASKS).all()
    pop = np.array([bin(int(d)).count("1") for d in des[::173]])
    assert (pop >= 1).all() and (pop <= C.N_TASKS).all()

    # init mirrors, empty hands, agent cell holds no object
    np.testing.assert_array_equal(np.asarray(p.init_key), slot_key)
    assert (np.asarray(p.holding) == 0).all()
    assert (np.asarray(p.obj_here) == 0).all()
    assert (np.asarray(p.icode_here) == C.AGENT_INIT_MARK).all()
    assert (np.asarray(p.achieved) == 0).all()
    assert (np.asarray(p.step_num) == 0).all()


def test_fused_reset_respects_task_config_interpret():
    """stacking=False / selected_tasks restrict the desired draw.

    (The sweep's 8x8 single-task learning benchmark regressed 30x when the
    first kernel version always drew stacked 9-task goals — this pins the
    craftingworld_ray.py:169-176 semantics per config.)
    """
    import dataclasses

    from gym_craftingworld_tpu import flat_config

    cfg = dataclasses.replace(flat_config(), stacking=False)
    p = fresh_packed_fused(cfg, 5, BLOCK, interpret=True)
    des = np.asarray(p.desired).astype(np.int64)
    pop = np.array([bin(int(d)).count("1") for d in des])
    assert (pop == 1).all()  # exactly one task when not stacking

    cfg2 = dataclasses.replace(
        flat_config(), selected_task_indices=(1, 4), number_of_tasks=2)
    p2 = fresh_packed_fused(cfg2, 5, BLOCK, interpret=True)
    des2 = np.asarray(p2.desired).astype(np.int64)
    allowed = (1 << 1) | (1 << 4)
    assert (des2 & ~allowed == 0).all()
    assert (des2 != 0).all()
