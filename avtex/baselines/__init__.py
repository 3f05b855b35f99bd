"""Audio-conditioning baselines (SURVEY.md §2.3).

TPU-native re-expressions of the four standalone reference scripts
(reference: baselines/audio_baselines/): the per-example linear scans become
one cosine matmul; the random walks are counter-based jax.random draws.
"""

from .audio_nn import audio_nearest_neighbour
from .random_walks import random_sequential_walk, random_segment_walk
from .shift import shift_audio

__all__ = ["audio_nearest_neighbour", "random_sequential_walk",
           "random_segment_walk", "shift_audio"]
