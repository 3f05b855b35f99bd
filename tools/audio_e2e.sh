#!/bin/bash
# Audio-conditioned flagship end-to-end on hardware: the paper's headline
# mode (-m 2 -e -da <wav> -alpha 0.5 -daf VGG — reference validate.py:
# 260-296,524-527,796-807). Trains the audio+video contrastive model
# (SlowFast video tower + VGGish audio tower) on a 10 s clip WITH source
# audio, then synthesizes driven by a DIFFERENT wav: VGGish embedding of
# source + driving audio, alpha blending of video/audio logits, seed from
# the audio argmax, driving-audio mux into the output container. Every
# stage on the TPU. Meant for a healthy pool window (the runbook probes
# first); results go to BASELINE.md "Audio-conditioned end-to-end".
set -eu
cd "$(dirname "$0")/.."
WORK=${WORK:-/tmp/audio_e2e}
# Hardware defaults (flagship geometry); override EA/SIZE for a cheap
# CPU wiring check: EA=resnet10 SIZE=32 EPOCHS=1 bash tools/audio_e2e.sh
EA=${EA:-slowfast}
SIZE=${SIZE:-224}
EPOCHS=${EPOCHS:-2}
rm -rf "$WORK"; mkdir -p "$WORK/data/videos" "$WORK/data/audio" "$WORK/data/target"

SIZE=$SIZE python - "$WORK/data" <<'EOF'
import os
import sys
import numpy as np
from avtex.media import write_video, write_wav
root = sys.argv[1]
hw = int(os.environ["SIZE"])
t, h, w, fps = 300, hw, hw, 30   # 10 s @ 30 fps
yy, xx = np.mgrid[0:h, 0:w]
frames = np.stack([
    np.clip(np.sin(xx / 16 + 2 * np.pi * i / 60) * 90 + 127
            + 30 * np.cos(yy / 24 + 2 * np.pi * i / 90), 0, 255)
    for i in range(t)
]).astype(np.uint8)[..., None].repeat(3, -1)
write_video(frames, f"{root}/videos/clip.mp4", fps=float(fps))
# Source audio: 10 s, amplitude-modulated tone locked to the video phase
# (so the contrastive AV objective has real structure to learn).
sr = 16000
ts = np.arange(10 * sr) / sr
src = (0.5 * np.sin(2 * np.pi * 440 * ts)
       * (0.6 + 0.4 * np.sin(2 * np.pi * ts / 2))).astype(np.float32)
write_wav(f"{root}/audio/clip.wav", src, sr)
# Driving audio: 15 s, different carrier + faster envelope — the texture
# must follow THIS rhythm, and its length clips the synthesis.
td = np.arange(15 * sr) / sr
drv = (0.5 * np.sin(2 * np.pi * 660 * td)
       * (0.5 + 0.5 * np.square(np.sin(2 * np.pi * td * 1.5)))
       ).astype(np.float32)
write_wav(f"{root}/target/driving.wav", drv, sr)
print("clip + source wav + driving wav written", frames.shape)
EOF

common=(-m 2 -ea "$EA" -size "$SIZE" -vdata "$WORK/data/videos"
        -adata "$WORK/data/audio" -dadata "$WORK/data/target" -vl clip
        -ckpt "$WORK/ckpt" -logdir "$WORK/logs" -rf "$WORK/results")

echo "=== train (-m 2): $EPOCHS epochs, bs=2, negs=8, AV towers ==="
t0=$SECONDS
python -m avtex.cli.main "${common[@]}" -bs 2 -negs 8 -epochs "$EPOCHS" -lr 1e-2
echo "train_m2_wall_s $((SECONDS - t0))"

echo "=== synthesize (-m 2 -e -da driving -alpha 0.5 -daf VGG) ==="
t1=$SECONDS
python -m avtex.cli.main "${common[@]}" -bs 2 -negs 8 -e -th 0.2 -nvl 30 \
    -da driving -alpha 0.5 -daf VGG
echo "synth_m2_wall_s $((SECONDS - t1))"
echo "total_m2_wall_s $((SECONDS - t0))"
ls -la "$WORK/results" || true
