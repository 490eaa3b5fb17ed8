"""Pallas TPU kernels — the hand-written 'native' layer of the compute
path (SURVEY.md §2.2: where the reference's stack has CUDA, this stack
has Mosaic)."""

from .rollout import greedy_rollout_pallas

__all__ = ["greedy_rollout_pallas"]
