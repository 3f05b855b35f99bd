#!/bin/bash
# Flagship CLI end-to-end on hardware: train SlowFast@224 2 epochs on a
# 10 s 30 fps clip, then synthesize — the real user path (MIGRATING.md),
# with wall-clock per stage. Meant to run in a HEALTHY pool window (the
# runbook probes before calling this); BASELINE.md "Flagship end-to-end".
set -eu
cd "$(dirname "$0")/.."
WORK=${WORK:-/tmp/cli_e2e}
rm -rf "$WORK"; mkdir -p "$WORK/data/videos"

python - "$WORK/data/videos/clip.mp4" <<'EOF'
import sys
import numpy as np
from avtex.media import write_video
t, h, w = 300, 224, 224   # 10 s @ 30 fps
yy, xx = np.mgrid[0:h, 0:w]
frames = np.stack([
    np.clip(np.sin(xx / 16 + 2 * np.pi * i / 60) * 90 + 127
            + 30 * np.cos(yy / 24 + 2 * np.pi * i / 90), 0, 255)
    for i in range(t)
]).astype(np.uint8)[..., None].repeat(3, -1)
write_video(frames, sys.argv[1], fps=30.0)
print("clip written", frames.shape)
EOF

common=(-m 1 -ea slowfast -vdata "$WORK/data/videos" -vl clip
        -ckpt "$WORK/ckpt" -logdir "$WORK/logs" -rf "$WORK/results")

echo "=== train: 2 epochs, bs=2, negs=8 ==="
t0=$SECONDS
python -m avtex.cli.main "${common[@]}" -bs 2 -negs 8 -epochs 2 -lr 1e-2
echo "train_wall_s $((SECONDS - t0))"

echo "=== synthesize: 30 s texture, th=0.2 ==="
# Same hyperparameter flags as training: the best-checkpoint path is
# derived from the flag string (reference main.py:520-534), and the CLI
# refuses to synthesize on random weights when the derivation misses.
t1=$SECONDS
python -m avtex.cli.main "${common[@]}" -bs 2 -negs 8 -e -th 0.2 -nvl 30
echo "synth_wall_s $((SECONDS - t1))"
echo "total_wall_s $((SECONDS - t0))"
ls -la "$WORK/results" || true
