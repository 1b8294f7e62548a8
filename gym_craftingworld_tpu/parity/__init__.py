from gym_craftingworld_tpu.parity import oracle
from gym_craftingworld_tpu.parity.host_rng import ParityReset

__all__ = ["ParityReset", "oracle"]
