"""Actor-critic policy models (flax)."""

from .policy import ActorCriticCNN, ActorCriticMLP, make_model

__all__ = ["ActorCriticMLP", "ActorCriticCNN", "make_model"]
