"""End-to-end API parity mode: the public env shim with ``rng_mode='parity'``
must replay reference episodes bit-exactly — same seed, same actions, same
observations/rewards/dones — through the *public* interfaces of both packages."""

import numpy as np
import pytest

from gym_craftingworld_tpu.api import CraftingWorldEnvOneHot, CraftingWorldEnvRay
from gym_craftingworld_tpu.parity import oracle

pytestmark = pytest.mark.skipif(
    not oracle.reference_available(), reason="reference checkout not present"
)


@pytest.mark.parametrize("seed", [0, 23])
def test_public_api_episode_parity(seed):
    ref = oracle.make_reference_env("onehot", seed=seed)
    ours = CraftingWorldEnvOneHot(seed=seed, rng_mode="parity")

    for ep in range(2):
        ref_obs = ref.reset()
        our_obs = ours.reset()
        np.testing.assert_array_equal(
            our_obs["observation"].astype(np.int64), np.array(ref_obs["observation"])
        )
        np.testing.assert_array_equal(
            our_obs["desired_goal"].astype(np.int64), np.array(ref_obs["desired_goal"])
        )
        rng = np.random.RandomState(seed + ep)
        for t in range(120):
            a = int(rng.randint(6))
            r_obs, r_rew, r_done, r_info = ref.step(a)
            o_obs, o_rew, o_done, o_info = ours.step(a)
            assert o_rew == r_rew, f"ep {ep} step {t}"
            assert o_done == r_done, f"ep {ep} step {t}"
            np.testing.assert_array_equal(
                o_obs["observation"].astype(np.int64),
                np.array(r_obs["observation"]),
                err_msg=f"ep {ep} step {t}",
            )
            np.testing.assert_array_equal(
                o_info["achieved_goal"], np.array(r_info["achieved_goal"])
            )
            if r_done:
                break


def test_public_api_pixel_parity():
    seed = 4
    ref = oracle.make_reference_env("ray", seed=seed)
    ours = CraftingWorldEnvRay(seed=seed, rng_mode="parity")
    ref_obs = ref.reset()
    our_obs = ours.reset()
    for key in ["observation", "desired_goal", "init_observation"]:
        np.testing.assert_array_equal(
            our_obs[key].astype(np.int64), np.array(ref_obs[key]), err_msg=key
        )
    rng = np.random.RandomState(99)
    for t in range(40):
        a = int(rng.randint(6))
        r_obs, *_ = ref.step(a)
        o_obs, *_ = ours.step(a)
        np.testing.assert_array_equal(
            o_obs["observation"].astype(np.int64),
            np.array(r_obs["observation"]),
            err_msg=f"step {t}",
        )


def test_parity_mode_validation():
    with pytest.raises(ValueError):
        CraftingWorldEnvRay(seed=0, rng_mode="parity", batch_size=2)
    with pytest.raises(ValueError):
        CraftingWorldEnvRay(seed=0, rng_mode="warp")


def test_reference_helpers():
    env = CraftingWorldEnvRay(seed=0)
    row = env.one_hot(obj=3, agent=True, holding=1)
    assert row == [0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 1, 0]
    obj, agent, holding = env.translate_one_hot(np.array(row))
    assert (obj, agent, holding) == (3, 1, 1)
    obj, agent, holding = env.translate_one_hot(np.zeros(12, int))
    assert (obj, agent, holding) == (None, 0, None)
