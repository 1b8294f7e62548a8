from gym_craftingworld_tpu.ops.fused_rollout import (
    fused_rollout,
    fused_rollout_actions,
)

__all__ = ["fused_rollout", "fused_rollout_actions"]
