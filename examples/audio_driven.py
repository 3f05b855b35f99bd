"""Audio-conditioned video textures: train AV towers, drive with a wav.

The library equivalent of the paper's headline mode:
    avtex -m 2 ... ; avtex -m 2 -e -da song -alpha 0.5 -daf VGG
(reference workflow: contrastive_video_textures/main.py -m 2 train,
then validate.py:260-296,524-527 — VGGish scoring of source + driving
audio, alpha blending of video/audio logits, seed from the audio argmax,
driving audio muxed into the output).

Generates a procedural looping clip with an amplitude-modulated source
tone, trains the audio+video contrastive model for a few epochs, then
synthesizes a texture driven by a DIFFERENT wav. Runs on CPU in a few
minutes; on a TPU use the flagship geometry (enc_arch="slowfast",
img_size=224 — tools/audio_e2e.sh is the hardware version).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # checkout use; no-op when installed

import tempfile

import numpy as np

from avtex.audio.mel import waveform_to_examples
from avtex.config import Config
from avtex.media import read_video, write_video, write_wav
from avtex.synth.pipeline import synthesize
from avtex.train.loop import train_video

out_dir = tempfile.mkdtemp(prefix="avtex_audio_driven_")

# --- a looping clip (period 20 frames) + a source tone locked to it ----
t, h, w, fps = 80, 32, 32, 8
yy, xx = np.mgrid[0:h, 0:w]
frames = np.stack([
    np.clip(np.sin(xx / 3 + 2 * np.pi * i / 20) * 90 + 127 + yy, 0, 255)
    for i in range(t)
]).astype(np.uint8)[..., None].repeat(3, -1)
video_path = os.path.join(out_dir, "loop.mp4")
write_video(frames, video_path, fps=float(fps))

sr = 16000
ts = np.arange(int(t / fps * sr)) / sr
source = (0.5 * np.sin(2 * np.pi * 440 * ts)
          * (0.6 + 0.4 * np.sin(2 * np.pi * ts * fps / 20))
          ).astype(np.float32)   # envelope shares the video's loop period
audio_path = os.path.join(out_dir, "loop.wav")
write_wav(audio_path, source, sr)

# --- driving audio: different carrier, faster rhythm -------------------
td = np.arange(6 * sr) / sr
driving = (0.5 * np.sin(2 * np.pi * 660 * td)
           * (0.5 + 0.5 * np.square(np.sin(2 * np.pi * td * 1.2)))
           ).astype(np.float32)
driving_path = os.path.join(out_dir, "driving.wav")
write_wav(driving_path, driving, sr)

# --- train the audio+video model (model_type=2) -------------------------
cfg = Config(
    enc_arch="resnet10",   # flagship is "slowfast" (use img_size=224)
    model_type=2,          # audio+video contrastive towers
    img_size=32,
    window=4, stride=2,
    n_negs=3, batch_size=4,
    lr=0.05, epochs=4,
    new_video_length=4,    # seconds of texture (driving length also clips)
    threshold=0.4,
    alpha=0.5,             # blend: alpha*video logits + (1-alpha)*audio
    da_feats="VGG",        # reference default scoring (VGGish features)
    mini_batchsize=8,
    seed=0,
)
video, fps_read = read_video(video_path)
audio_examples = np.asarray(waveform_to_examples(source, sr))
state, losses = train_video(cfg, video, audio_examples,
                            ckpt_dir=out_dir, ckpt_name="loop_av")
print(f"epoch losses: {[round(x, 3) for x in losses]}")

# --- synthesize, driven by the new wav ----------------------------------
out = synthesize(cfg, video_path, state.params, audio_path=audio_path,
                 driving_audio_path=driving_path, out_dir=out_dir)
r = out["result"]
print(f"audio-driven walk: seed {r.seed_id}, "
      f"{len(r.indices)} steps, {int(r.jumps.sum())} jumps")
print(f"outputs in {out_dir}: {sorted(os.listdir(out_dir))}")
