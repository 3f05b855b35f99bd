from .segments import (
    num_segments,
    segment_start_frames,
    segment_frame_ids,
    sample_negatives,
    hard_negative_ids,
    target_ordering,
)
from .infonce import info_nce_from_logits, info_nce_loss
from .classic_temporal import ClassicTemporal, classic_temporal_distances
