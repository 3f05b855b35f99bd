"""Host-side media I/O.

Replaces the reference's native I/O surface (torchvision.io/PyAV decode,
librosa/resampy audio, ffmpeg-subprocess muxing — reference:
contrastive_video_textures/dataset/dataset.py:41, utils/utils.py:43-189)
with OpenCV/scipy paths that feed numpy straight into jnp device buffers.
"""

from .video import read_video, video_fps, write_video, write_frames_png
from .audio_io import read_wav, write_wav
from .mux import mux_audio_video, save_texture_outputs

__all__ = [
    "read_video", "video_fps", "write_video", "write_frames_png",
    "read_wav", "write_wav", "mux_audio_video", "save_texture_outputs",
]
