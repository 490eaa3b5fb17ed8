"""On-device PPO actor-learner training (SURVEY.md §3.4)."""

from .ppo import PPOTrainer, RunnerState, make_train

__all__ = ["make_train", "PPOTrainer", "RunnerState"]
