"""Observability: meters, TensorBoard logging, profiler hooks.

Replaces the reference's tensorboardX Logger + AverageMeter
(reference: contrastive_video_textures/utils/logger.py:8-81,
utils/utils.py:7-40) and adds what the reference lacks: jax.profiler trace
capture around hot stages (SURVEY.md §5.1).
"""

from .meters import AverageMeter, Timer
from .logger import Logger
from .profiler import trace

__all__ = ["AverageMeter", "Timer", "Logger", "trace"]
