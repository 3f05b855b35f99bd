"""Warm texture serving: embed once, synthesize many.

The deployment shape for "infinite textures": keep one TextureServer
resident per source video; each request is a walk over the precomputed
[L, L] logit matrix plus stitching — measured 86 ms per 30 s texture
(38 ms indices-only) at SlowFast@224 on one v5e chip (BASELINE.md
"Warm serving"). The reference re-runs its whole validate.py pipeline
(~minutes) per request (reference: validate.py:63-874).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # checkout use; no-op when installed

import tempfile

import numpy as np

from avtex.config import Config
from avtex.media import write_video, write_wav
from avtex.synth.server import TextureServer

out_dir = tempfile.mkdtemp(prefix="avtex_serve_")

# procedural source clip + a source audio track
t, h, w = 80, 32, 32
yy, xx = np.mgrid[0:h, 0:w]
frames = np.stack([
    np.clip(np.sin(xx / 3 + 2 * np.pi * i / 20) * 90 + 127 + yy, 0, 255)
    for i in range(t)
]).astype(np.uint8)[..., None].repeat(3, -1)
video_path = os.path.join(out_dir, "loop.mp4")
write_video(frames, video_path, fps=8.0)
sr = 16000
wav = (0.3 * np.sin(np.arange(sr * 10) / sr * 2 * np.pi * 220)
       ).astype(np.float32)
audio_path = os.path.join(out_dir, "song.wav")
write_wav(audio_path, wav, sr)

cfg = Config(enc_arch="resnet10", model_type=1, img_size=32,
             new_video_length=3, threshold=0.4, mini_batchsize=8,
             da_feats="Mel", seed=0)

# params=None -> random-init encoder (fine for a demo; pass trained
# params from avtex.train / a checkpoint for real use)
server = TextureServer(cfg, video_path, params=None, audio_path=audio_path)
print(f"resident: {server.L} segments embedded once")

a = server.synthesize(seconds=3, threshold=0.4, seed=1)
b = server.synthesize(seconds=5, threshold=0.2, seed=2)          # longer, wilder
c = server.synthesize(seconds=3, driving_audio=audio_path,       # audio-driven
                      alpha=0.5, seed=3)
for name, r in [("a", a), ("b", b), ("c", c)]:
    print(f"request {name}: {len(r['result'].indices)} transitions, "
          f"{len(r['frames'])} frames"
          + (", audio attached" if r["audio"] is not None else ""))

# identical request -> identical texture (deterministic serving)
a2 = server.synthesize(seconds=3, threshold=0.4, seed=1)
assert np.array_equal(a["result"].indices, a2["result"].indices)
print("deterministic replay OK")
