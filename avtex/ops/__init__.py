"""Pallas TPU kernels for the hot ops (written per the Pallas guide).

The XLA paths in avtex.classic/avtex.synth are the semantic reference;
these kernels are the tuned versions used on TPU for large inputs.
"""

from .pairwise import pairwise_l2_pallas

__all__ = ["pairwise_l2_pallas"]
