"""Classic-baseline jump interpolation + position-bar tests
(reference contract: baselines/classic_video_textures/
video_textures.py:52-129, 216-221)."""

import numpy as np

from avtex.classic.interp_track import (burn_position_bars,
                                        classic_interp_track)


def _video(t=10, h=40, w=32):
    """Frames whose every pixel equals the frame index (bar rows aside)."""
    return (np.ones((t, h, w, 3), np.uint8)
            * np.arange(t, dtype=np.uint8)[:, None, None, None])


def _fake_interp(f0, f1, n_mid):
    """Deterministic stand-in: mids are constant 200+k."""
    return np.stack([np.full_like(f0, 200 + k) for k in range(n_mid)])


def test_interp_track_frame_counts():
    vid = _video()
    # walk 0->1->2 ->(jump) 5 ->6; SF=3 => hold=1, 2 mids per jump
    walk = np.array([0, 1, 2, 5, 6])
    out = classic_interp_track(vid, walk, sf=3, interp_fn=_fake_interp)
    # start: 1+1 held; two non-jumps: 2 each; jump: -1 held +2 mids (no
    # jumped-to frame!); final non-jump: 2  => 2+2+2-1+2+2 = 9
    assert len(out) == 9
    # body pixels (above the bar rows): start, hold, 1,1, 2 (one held copy
    # removed), mids 200/201, then 6,6
    body = out[:, 0, 0, 0]
    np.testing.assert_array_equal(body, [0, 0, 1, 1, 2, 200, 201, 6, 6])


def test_interp_track_mids_per_jump_scale_with_sf():
    vid = _video()
    walk = np.array([0, 5])  # single jump
    for sf in (3, 5):
        out = classic_interp_track(vid, walk, sf=sf, interp_fn=_fake_interp)
        hold = (sf - 1) // 2
        # 1 + hold (start) - hold (removed at jump) + (sf-1) mids
        assert len(out) == 1 + (sf - 1)


def test_interp_track_bar_semantics():
    vid = _video()
    walk = np.array([0, 1, 5])
    out = classic_interp_track(vid, walk, sf=3, interp_fn=_fake_interp)
    h, w = vid.shape[1:3]
    bar_rows = slice(h - 25, h - 10)
    # opening frame: reference's bar[:, -3:3] is the empty slice => blank
    assert not out[0, bar_rows].any()
    # non-jump frame (index 2 in seq: frame 1): marker from PREVIOUS index 0
    # => int(0 * w / 10) = 0 => again the empty -3:3 slice quirk
    assert not out[2, bar_rows].any()
    # interpolated frames carry a blank bar
    mids = [k for k in range(len(out)) if out[k, 0, 0, 0] >= 200]
    for k in mids:
        assert not out[k, bar_rows].any()


def test_burn_position_bars_geometry():
    vid = _video(t=10, h=40, w=32)
    ids = np.array([0, 5, 9])
    out = burn_position_bars(vid[ids], ids, total_frames=10)
    h, w = 40, 32
    bar_rows = slice(h - 25, h - 10)
    # fid=0 -> n=0 -> raw slice [-4:4] is empty: blank bar (reference quirk)
    assert not out[0, bar_rows].any()
    # marker at fid*w//total, 8 px wide, pure red (when n >= 4)
    for k, fid in [(1, 5), (2, 9)]:
        n = int(fid * w // 10)
        band = out[k, bar_rows, n - 4: n + 4]
        assert (band[..., 0] == 255).all() and (band[..., 1:] == 0).all()
        # rest of the bar is black
        mask = np.ones(w, bool)
        mask[n - 4: n + 4] = False
        assert not out[k, bar_rows][:, mask].any()
    # body above the bar is untouched
    np.testing.assert_array_equal(out[:, : h - 25], vid[ids][:, : h - 25])


def test_classic_driver_emits_interp_outputs(tmp_path):
    """End-to-end: run_classic writes the _interp track for mode 1."""
    from avtex.classic.driver import run_classic
    from avtex.config import ClassicConfig
    from avtex.media import mux_audio_video

    rng = np.random.default_rng(0)
    vid = (rng.random((40, 48, 48, 3)) * 255).astype(np.uint8)
    src = str(tmp_path / "v.mp4")
    mux_audio_video(vid, None, 22050, src, fps=10.0)

    cfg = ClassicConfig(model_type=1, feats="RGB", sigmas=(4.5,),
                        new_video_length=2, SF=3, filter_size=8,
                        results_folder=str(tmp_path / "out"))
    res = run_classic(cfg, src, out_dir=str(tmp_path / "out"),
                      interp_fn=_fake_interp)
    (sigma, entry), = res["sigma_results"].items()
    assert "texture_interp" in entry["paths"]
    import os
    assert os.path.exists(entry["paths"]["texture_interp"])
