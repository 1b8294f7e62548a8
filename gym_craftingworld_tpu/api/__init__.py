from gym_craftingworld_tpu.api.gym_env import (
    CraftingWorldEnvAltObs,
    CraftingWorldEnvFlat,
    CraftingWorldEnvOneHot,
    CraftingWorldEnvRay,
)
from gym_craftingworld_tpu.api.registry import make, register, register_gymnasium
from gym_craftingworld_tpu.api.vector import CraftingWorldVectorEnv

__all__ = [
    "CraftingWorldEnvAltObs",
    "CraftingWorldEnvFlat",
    "CraftingWorldEnvOneHot",
    "CraftingWorldEnvRay",
    "CraftingWorldVectorEnv",
    "make",
    "register",
    "register_gymnasium",
]
