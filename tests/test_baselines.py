"""Audio-baselines tests (SURVEY.md §2.3 parity)."""

import numpy as np

from avtex.baselines import (audio_nearest_neighbour, random_segment_walk,
                             random_sequential_walk, shift_audio)


def test_audio_nn_exact_match(rng):
    src = rng.standard_normal((10, 100, 64)).astype(np.float32)
    # driving examples are exact copies of segments 3, 7
    driving = src[[3, 7]]
    frame_ids, segs = audio_nearest_neighbour(driving, src, window=6,
                                              stride=2, max_length=8)
    np.testing.assert_array_equal(segs[:2], [3, 7])
    # first match emits its full window [6..12), second its last S=2 frames
    np.testing.assert_array_equal(frame_ids, list(range(6, 12)) + [18, 19])


def test_audio_nn_keeps_block_overshoot(rng):
    # reference audio_nearestneighbour.py:102-140: the while loop emits
    # whole blocks and saves every frame — no truncation to max_length.
    src = rng.standard_normal((10, 100, 64)).astype(np.float32)
    driving = src[[3, 7]]
    frame_ids, segs = audio_nearest_neighbour(driving, src, window=6,
                                              stride=2, max_length=7)
    # 6-frame first window + full 2-frame second block = 8 frames kept
    np.testing.assert_array_equal(frame_ids, list(range(6, 12)) + [18, 19])
    np.testing.assert_array_equal(segs, [3, 7])


def test_audio_nn_nonpositive_sims_fall_back_to_segment_zero(rng):
    # reference audio_nearestneighbour.py:103-121: max_sim starts at 0 with
    # a strict `>`, so all-nonpositive cosines leave q_id at 0.
    src = np.eye(4, dtype=np.float32).reshape(4, 2, 2)
    driving = -np.ones((1, 2, 2), dtype=np.float32)  # cosine <= 0 vs every row
    _, segs = audio_nearest_neighbour(driving, src, window=6, stride=2,
                                      max_length=6)
    assert segs[0] == 0


def test_random_sequential_walk_wraps():
    ids = random_sequential_walk(num_segments=5, window=6, stride=2,
                                 max_length=40, seed=1)
    assert len(ids) == 40
    # after the first window, frames advance by stride blocks sequentially
    diffs = np.diff(ids)
    assert set(diffs.tolist()) <= {1, 1 - 2 * 5, -7}  # wrap jumps allowed


def test_random_segment_walk_lengths():
    ids, segs = random_segment_walk(num_segments=8, window=6, stride=2,
                                    max_length=30, seed=2)
    assert len(ids) == 30
    assert all(0 <= s < 8 for s in segs)


def test_shift_audio_roundtrip():
    audio = np.arange(100.0)
    shifted, secs = shift_audio(audio, sample_rate=10, shift_seconds=2.0)
    # reference random_shift.py:21-22: tail moves to the front (left roll)
    np.testing.assert_array_equal(shifted[:80], audio[20:])
    np.testing.assert_array_equal(shifted[80:], audio[:20])
    assert secs == 2.0
    # random draw is the reference's integer randint(4, 12)
    _, secs2 = shift_audio(audio, sample_rate=1, seed=3)
    assert secs2 in {4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0}
