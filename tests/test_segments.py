"""Golden tests for segment-index arithmetic vs reference dataset semantics
(reference: dataset/dataset.py:114-190)."""

import math

import numpy as np
import pytest

from avtex.contrastive import segments


@pytest.mark.parametrize("T,fps", [(300, 30), (421, 25), (1800, 30), (95, 12)])
def test_num_segments_matches_reference_formula(T, fps):
    W = math.ceil(fps / 2)
    S = math.ceil(fps / 5)
    assert segments.num_segments(T, W, S, "train") == math.floor((T - W) / S) - 1
    assert segments.num_segments(T, W, S, "val") == math.floor((T - W) / S)


def test_segment_frame_ids():
    ids = segments.segment_frame_ids(3, window=15, stride=6)
    assert ids.tolist() == list(range(18, 33))


def test_hard_negatives_interior():
    h = segments.hard_negative_ids(10, max_id=100)
    assert h.tolist() == [6, 7, 8, 9, 12, 13, 14, 15]


def test_hard_negatives_clipped_low_and_high():
    assert segments.hard_negative_ids(1, max_id=100).tolist() == [0, 3, 4, 5, 6]
    assert segments.hard_negative_ids(99, max_id=100).tolist() == [95, 96, 97, 98]


def test_sample_negatives_excludes_query_and_pos(rng):
    n_total, idx = 40, 7
    negs = segments.sample_negatives(idx, n_total, n_negs=20, rng=rng)
    assert len(negs) == 20
    hard = segments.hard_negative_ids(idx, n_total)
    assert negs[: len(hard)].tolist() == hard.tolist()
    # Random tail excludes query and positive.
    assert idx not in negs[len(hard):]
    assert idx + 1 not in negs[len(hard):]


def test_target_ordering():
    order = segments.target_ordering(q_id=3, L=8)
    assert order[0] == 4
    assert sorted(order.tolist()) == [0, 1, 2, 4, 5, 6, 7]
    # Last segment: pos clamps to L-1.
    order = segments.target_ordering(q_id=7, L=8)
    assert order[0] == 7
    assert sorted(order.tolist()) == [0, 1, 2, 3, 4, 5, 6, 7][:-1] + [7]


def test_gather_windows_shape_and_content():
    frames = np.arange(40 * 2 * 2).reshape(40, 2, 2)
    w = segments.gather_windows(frames, window=15, stride=6)
    assert w.shape == (4, 15, 2, 2)
    np.testing.assert_array_equal(w[2], frames[12:27])


def test_require_segments_short_video_message():
    """User-facing entries fail loudly on too-short videos (the reference
    crashes downstream with shape errors when dataset.py:114-119 goes
    <= 0)."""
    import pytest

    from avtex.contrastive.segments import require_segments

    with pytest.raises(ValueError, match="too short.*reduce -w"):
        require_segments(10, 15, 6, "val", what="clip.mp4")
    with pytest.raises(ValueError, match="train segment"):
        require_segments(20, 15, 6, "train")
    # boundary: smallest valid sizes pass through
    assert require_segments(15 + 2 * 6, 15, 6, "val") == 2
    assert require_segments(15 + 2 * 6, 15, 6, "train") == 1
