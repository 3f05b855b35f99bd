from .d1 import pairwise_l2, distance_to_transition_probs, compute_d1
from .d2 import binomial_coeffs, diagonal_filter_smooth, compute_d2
from .future_cost import anticipated_future_cost, threshold_rows, compute_d3
from .fused import classic_transition_matrix
from .sharded import classic_transition_matrix_sharded
from . import sampler
from .sampler import (
    sample_texture_walk,
    sample_texture_walk_host,
    expand_walk_to_frames,
)
