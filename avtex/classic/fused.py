"""The whole classic pipeline as ONE device program.

The staged API (compute_d1 -> compute_d2 -> compute_d3) mirrors the
reference's script boundaries (baselines/classic_video_textures/
computeD1.py / computeD2.py / q_learning.py), which forced a host fetch
of each [N, N] fp32 matrix between stages — ~13 MB per fetch at N=1800,
which dominates wall-clock through a remote attachment (the compute
itself is one matmul + O(fs) strided adds + a geometric fixed point).

Here the full chain D1 -> D2 -> D3 -> P3 -> threshold runs as one jitted
program: one dispatch, one fetch (the final thresholded transition
matrix the walk consumes). sigma_factor and the value-iteration scalars
are traced, so a sigma sweep reuses one compiled executable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .d1 import distance_to_transition_probs, pairwise_l2
from .d2 import diagonal_filter_smooth
from .future_cost import anticipated_future_cost, threshold_rows


@functools.partial(jax.jit, static_argnames=("filter_size", "stride",
                                             "normalize", "use_pallas"))
def _fused(feats, sigma_factor, p, alpha, eps, thresholding, *,
           filter_size, stride, normalize, use_pallas):
    if use_pallas:
        from avtex.ops import pairwise_l2_pallas
        d1 = pairwise_l2_pallas(feats, normalize=normalize)
    else:
        d1 = pairwise_l2(feats, normalize=normalize)
    d2 = diagonal_filter_smooth(d1, filter_size, stride)
    d3 = anticipated_future_cost(d2, p=p, alpha=alpha, eps=eps)
    p3, _ = distance_to_transition_probs(d3, sigma_factor)
    return threshold_rows(p3, thresholding)


def classic_transition_matrix(feats, sigma_factor: float, *,
                              filter_size: int = 16, stride: int = 1,
                              normalize: bool = False, p: float = 0.7,
                              alpha: float = 0.997, eps: float = 1e-2,
                              thresholding: float = 0.75) -> jnp.ndarray:
    """P3_new (thresholded transition matrix) in one device dispatch.

    Numerically identical to the staged
    compute_d1 -> compute_d2 -> compute_d3 chain (same ops, one program);
    pinned by tests/test_classic.py::test_fused_pipeline_matches_staged.
    """
    x = feats.reshape(feats.shape[0], -1)
    use_pallas = (jax.default_backend() == "tpu"
                  and x.shape[0] * x.shape[1] > 32_000_000)
    return _fused(x, sigma_factor, p, alpha, eps, thresholding,
                  filter_size=filter_size, stride=stride,
                  normalize=normalize, use_pallas=use_pallas)
