"""Media I/O tests: video roundtrip, wav roundtrip, AVI muxer parity.

Covers the host-I/O layer that replaces the reference's torchvision.io /
librosa / ffmpeg surface (SURVEY.md §2.4).
"""

import struct

import numpy as np
import pytest

from avtex.media import (read_video, write_video, read_wav, write_wav,
                         mux_audio_video, video_fps)
from avtex.media import avimux


@pytest.fixture
def frames():
    # Smooth moving gradient: codec-friendly, deterministic.
    t, h, w = 24, 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    out = np.stack([
        ((xx + 4 * i) % w * (255 / w))[..., None].repeat(3, -1)
        * np.array([1.0, 0.7, 0.4]) + yy[..., None] * 0.5
        for i in range(t)])
    return np.clip(out, 0, 255).astype(np.uint8)


def test_video_roundtrip(tmp_path, frames):
    p = str(tmp_path / "v.mp4")
    write_video(frames, p, fps=12.0)
    out, fps = read_video(p)
    assert fps == pytest.approx(12.0, abs=0.1)
    assert out.shape == frames.shape
    # lossy codec: frames should still be close
    assert np.mean(np.abs(out.astype(int) - frames.astype(int))) < 16
    assert video_fps(p) == pytest.approx(12.0, abs=0.1)


def test_video_subsample(tmp_path, frames):
    p = str(tmp_path / "v.mp4")
    write_video(frames, p, fps=12.0)
    out, _ = read_video(p, subsample_rate=3)
    assert out.shape[0] == 8


def test_wav_roundtrip(tmp_path):
    sr = 16000
    wave = (np.sin(np.linspace(0, 2 * np.pi * 440, sr)) * 0.5).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, wave, sr)
    back, sr2 = read_wav(p)
    assert sr2 == sr
    assert np.max(np.abs(back - wave)) < 1e-3


def test_avi_native_matches_python(tmp_path, frames):
    sr = 8000
    audio = np.sin(np.linspace(0, 100, sr)).astype(np.float32) * 0.3
    p_py = avimux.write_avi_python(str(tmp_path / "p.avi"), frames, 12.0,
                                   audio=audio, sample_rate=sr)
    p_nat = avimux.write_avi(str(tmp_path / "n.avi"), frames, 12.0,
                             audio=audio, sample_rate=sr)
    with open(p_py, "rb") as f1, open(p_nat, "rb") as f2:
        b_py, b_nat = f1.read(), f2.read()
    from avtex.native import muxer
    if muxer.available():
        assert b_py == b_nat
    # container sanity: RIFF/AVI magic + readable by OpenCV
    assert b_py[:4] == b"RIFF" and b_py[8:12] == b"AVI "
    import cv2
    cap = cv2.VideoCapture(p_py)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == len(frames)


def test_avi_audio_stream_intact(tmp_path, frames):
    """Parse the 01wb chunks back out and compare PCM samples exactly."""
    sr = 8000
    audio = (np.sin(np.linspace(0, 100, 2 * sr)) * 0.3).astype(np.float32)
    p = avimux.write_avi_python(str(tmp_path / "a.avi"), frames, 12.0,
                                audio=audio, sample_rate=sr)
    with open(p, "rb") as f:
        data = f.read()
    # walk the movi payload
    pcm = bytearray()
    pos = data.index(b"movi") + 4
    end = data.index(b"idx1")
    while pos < end - 8:
        cc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if cc == b"01wb":
            pcm.extend(data[pos + 8:pos + 8 + size])
        pos += 8 + size + (size % 2)
    got = np.frombuffer(bytes(pcm), dtype=np.int16)
    expect = (np.clip(audio, -1, 1) * (2 ** 15 - 1)).astype(np.int16)
    assert np.array_equal(got, expect)


def test_mux_fallback_writes_playable(tmp_path, frames):
    sr = 8000
    audio = np.zeros(sr, np.float32)
    out = mux_audio_video(frames, audio, sr, str(tmp_path / "t.mp4"), 12.0)
    import os
    assert os.path.exists(out)


def test_meters():
    from avtex.obs import AverageMeter, Timer
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2
    with Timer() as t:
        pass
    assert t.elapsed >= 0.0


def test_avi_stereo_audio(tmp_path, frames):
    sr = 8000
    t = np.linspace(0, 1, sr)
    stereo = np.stack([np.sin(2 * np.pi * 220 * t),
                       np.sin(2 * np.pi * 440 * t)], 1).astype(np.float32) * 0.3
    p = avimux.write_avi(str(tmp_path / "s.avi"), frames, 12.0,
                         audio=stereo, sample_rate=sr)
    with open(p, "rb") as f:
        data = f.read()
    # WAVEFORMATEX channels field == 2
    strf_pos = data.index(b"auds")
    assert data[:4] == b"RIFF"
    import cv2
    cap = cv2.VideoCapture(p)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == len(frames)


def test_prefetch_preserves_order_and_exceptions():
    """A worker-thread failure must re-raise in the CONSUMER — a failing
    epoch must not look like a short successful one (a swallowed
    first-batch failure would leave the epoch meter at 0.0, 'beating'
    the early-stop threshold and checkpointing broken state as best)."""
    import pytest

    from avtex.data.pipeline import prefetch
    assert list(prefetch(iter(range(10)))) == list(range(10))

    def boom():
        yield 1
        raise RuntimeError("x")
    gen = prefetch(boom())
    assert next(gen) == 1
    with pytest.raises(RuntimeError, match="x"):
        next(gen)

    def boom_first():
        raise ValueError("first")
        yield  # pragma: no cover
    with pytest.raises(ValueError, match="first"):
        list(prefetch(boom_first()))


def test_logger_writes_events(tmp_path):
    from avtex.obs import Logger
    lg = Logger(str(tmp_path), "run")
    lg.log_scalar(1.0, "a", 0)
    lg.log_histogram(np.arange(10.0), "h", 0)
    lg.flush()
    import os
    files = []
    for root, _, fs in os.walk(str(tmp_path)):
        files += fs
    assert any("tfevents" in f for f in files)


def test_logger_log_video(tmp_path, frames):
    from avtex.obs import Logger
    lg = Logger(str(tmp_path), "v")
    lg.log_video(frames, "clip", 0)
    lg.flush()
    import os
    found = [f for _, _, fs in os.walk(str(tmp_path)) for f in fs]
    assert any("tfevents" in f for f in found)
