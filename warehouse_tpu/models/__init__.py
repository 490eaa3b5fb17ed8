"""Actor-critic policy models (flax)."""

from .policy import (ActorCriticCNN, ActorCriticMLP, ActorCriticRNN,
                     MultiPolicyActorCritic, make_model,
                     make_multi_policy_model)

__all__ = ["ActorCriticMLP", "ActorCriticCNN", "ActorCriticRNN",
           "MultiPolicyActorCritic", "make_model",
           "make_multi_policy_model"]
