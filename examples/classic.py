"""Classic Schödl video textures via the library API.

Two levels shown:
  1. run_classic — the full sigma-sweep driver (what `avtex-classic`
     wraps): features -> D1 -> D2 -> value iteration -> threshold ->
     texture walk -> muxed outputs per sigma.
  2. classic_transition_matrix — the fused one-device-program core
     (D1 -> D2 -> D3 -> threshold in a single dispatch, one fetch),
     measured 0.061 s for 1800 frames on one v5e chip including the
     device walk (BASELINE.md "Classic pipeline at production scale");
     the reference's torch-CPU D1 alone took 231.8 s at N=450.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # checkout use; no-op when installed

import tempfile

import numpy as np

from avtex.classic.driver import run_classic
from avtex.classic.fused import classic_transition_matrix
from avtex.config import ClassicConfig
from avtex.media import write_video

out_dir = tempfile.mkdtemp(prefix="avtex_classic_")

t, h, w = 60, 32, 32
yy, xx = np.mgrid[0:h, 0:w]
frames = np.stack([
    np.clip(np.sin(xx / 3 + 2 * np.pi * i / 15) * 90 + 127 + yy, 0, 255)
    for i in range(t)
]).astype(np.uint8)[..., None].repeat(3, -1)
video_path = os.path.join(out_dir, "loop.mp4")
write_video(frames, video_path, fps=8.0)

# 1. the full driver (Classic mode, RGB features, small sweep)
cfg = ClassicConfig(model_type=1, feats="RGB", filter_size=8,
                    new_video_length=3, sigmas=(4.5, 4.55),
                    start_frame=5, interpolation=False)
out = run_classic(cfg, video_path, out_dir=out_dir, num_steps=20)
for sigma, r in out["sigma_results"].items():
    print(f"sigma {sigma}: {out['jump_counts'][sigma]} jumps, "
          f"outputs {sorted(os.path.basename(p) for p in r['paths'].values())}")

# 2. the fused core on raw features (one device program, one fetch)
feats = (frames.reshape(t, -1) / 255.0).astype(np.float32)
probs = np.asarray(classic_transition_matrix(feats, sigma_factor=4.5,
                                             filter_size=8))
print(f"fused transition matrix: {probs.shape}, "
      f"{int((probs > 0).sum())} allowed transitions")
