"""Train a contrastive video-texture model and synthesize a texture.

The library equivalent of:
    avtex -m 1 -ea resnet10 ... ; avtex -m 1 -e ...
(reference workflow: contrastive_video_textures/main.py train + validate).

Generates a procedural looping clip, trains a small encoder for a few
epochs, then synthesizes a texture from the embed-once tables and writes
it to mp4. Runs on CPU in a few minutes; on a TPU use the flagship
geometry instead (enc_arch="slowfast", img_size=224 — see BASELINE.md).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # checkout use; no-op when installed

import tempfile

import numpy as np

from avtex.config import Config
from avtex.media import read_video, write_video
from avtex.synth.pipeline import synthesize
from avtex.train.loop import train_video

out_dir = tempfile.mkdtemp(prefix="avtex_quickstart_")

# --- a tiny procedural clip with a real loop (period 20 frames) -------
t, h, w = 80, 32, 32
yy, xx = np.mgrid[0:h, 0:w]
frames = np.stack([
    np.clip(np.sin(xx / 3 + 2 * np.pi * i / 20) * 90 + 127 + yy, 0, 255)
    for i in range(t)
]).astype(np.uint8)[..., None].repeat(3, -1)
video_path = os.path.join(out_dir, "loop.mp4")
write_video(frames, video_path, fps=8.0)

# --- train -------------------------------------------------------------
cfg = Config(
    enc_arch="resnet10",   # flagship is "slowfast" (use img_size=224)
    model_type=1,          # 1 = video-only; 2 = audio-conditioned
    img_size=32,
    window=4, stride=2,    # on real data these derive from fps
    n_negs=3, batch_size=4,
    lr=0.05, epochs=6,
    new_video_length=4,    # seconds of texture to synthesize
    threshold=0.4,         # transition-probability threshold (-th)
    mini_batchsize=8,
    seed=0,
)
video, fps = read_video(video_path)
state, losses = train_video(cfg, video, ckpt_dir=out_dir, ckpt_name="loop")
print(f"epoch losses: {[round(x, 3) for x in losses]}")

# --- synthesize from the trained params ---------------------------------
result = synthesize(cfg, video_path, state.params, out_dir=out_dir)
print(f"walk over segments: {[int(i) for i in result['result'].indices]}")
print(f"outputs in {out_dir}: {sorted(os.listdir(out_dir))}")
