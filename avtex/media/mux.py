"""Audio/video muxing and texture-output writing.

The reference shells out to ffmpeg for every mux (reference:
utils/utils.py:43-189). This environment has no ffmpeg binary, so:

- if an ``ffmpeg`` executable *is* on PATH we use it (H.264 + AAC, closest
  to the reference output contract);
- otherwise we fall back to the in-repo native AVI muxer
  (``avtex.media.avimux`` — C++ backed when built, pure-Python otherwise)
  which interleaves MJPEG video with PCM audio in one RIFF container;
- as a last resort, video-only mp4 plus a sidecar ``.wav``.
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Optional, Sequence

import numpy as np

from .audio_io import write_wav
from .video import write_video


def _ffmpeg_mux(frames: np.ndarray, wav_path: str, out_path: str,
                fps: float) -> str:
    tmp_video = out_path + ".video.mp4"
    write_video(frames, tmp_video, fps)
    cmd = ["ffmpeg", "-y", "-i", tmp_video, "-i", wav_path,
           "-c:v", "copy", "-c:a", "aac", "-shortest", out_path]
    subprocess.run(cmd, check=True, capture_output=True)
    os.remove(tmp_video)
    return out_path


def mux_audio_video(frames: np.ndarray, audio: Optional[np.ndarray],
                    sample_rate: int, out_path: str, fps: float) -> str:
    """Write frames (+ optional audio track) to one playable file.

    Returns the path actually written (extension may change to .avi when the
    native muxer is used).
    """
    if audio is None:
        return write_video(frames, out_path, fps)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    wav_path = os.path.splitext(out_path)[0] + ".wav"
    write_wav(wav_path, audio, sample_rate)
    if shutil.which("ffmpeg"):
        out = _ffmpeg_mux(frames, wav_path, out_path, fps)
        os.remove(wav_path)
        return out
    try:
        from . import avimux
        avi_path = os.path.splitext(out_path)[0] + ".avi"
        out = avimux.write_avi(avi_path, frames, fps,
                               audio=np.asarray(audio),
                               sample_rate=sample_rate)
        os.remove(wav_path)  # audio is in the container
        return out
    except Exception:  # noqa: BLE001 - fall back to sidecar audio
        write_video(frames, out_path, fps)
        return out_path


def save_texture_outputs(result_dir: str, name: str, frames: Sequence[np.ndarray],
                         fps: float, audio: Optional[np.ndarray] = None,
                         sample_rate: int = 22050,
                         frames_intp: Optional[Sequence[np.ndarray]] = None,
                         sf: int = 5) -> dict:
    """Write the synthesis artifacts the reference produces.

    Mirrors the output contract of reference utils/utils.py:43-189: the plain
    texture at source fps and, when interpolated frames exist, the slow-mo
    variant at ``fps * (sf + 1) / 2``.
    """
    os.makedirs(result_dir, exist_ok=True)
    out = {}
    out["texture"] = mux_audio_video(
        np.stack(list(frames)), audio, sample_rate,
        os.path.join(result_dir, f"{name}.mp4"), fps)
    if frames_intp is not None:
        out["texture_interp"] = mux_audio_video(
            np.stack(list(frames_intp)), audio, sample_rate,
            os.path.join(result_dir, f"{name}_interp.mp4"),
            fps * (sf + 1) / 2)
    return out
