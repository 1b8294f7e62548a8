"""Evaluation module: metrics shapes and expert skill-completion rates."""

import jax

from gym_craftingworld_tpu import EnvConfig
from gym_craftingworld_tpu import constants as C
from gym_craftingworld_tpu.train.evaluate import evaluate_expert, evaluate_policy
from gym_craftingworld_tpu.train.ppo import PPOConfig, init_train_state


def test_evaluate_random_policy():
    cfg = EnvConfig(height=5, width=5, max_steps=12)
    ppo = PPOConfig(hidden=16)
    ts = init_train_state(jax.random.PRNGKey(0), cfg, ppo)
    report = evaluate_policy(cfg, ppo, ts.params, num_episodes=16)
    assert report["episodes"] == 16
    assert 0.0 <= report["success_rate"] <= 1.0
    assert set(report["skill_completion"]) == set(C.TASK_LIST)
    assert report["mean_episode_steps"] <= 12


def test_evaluate_expert_high_success():
    report = evaluate_expert(num_episodes=10, seed=100, stacking=True,
                             max_steps=300)
    assert report["success_rate"] >= 0.9
    rates = [v for v in report["skill_completion"].values() if v is not None]
    assert all(r >= 0.8 for r in rates)
