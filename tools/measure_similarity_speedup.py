"""Measure the similarity-stage speedup vs the reference (BASELINE.json).

Two measured multipliers, recorded in BASELINE.md:

1. **All-pairs distance (classic D1)**: the reference's own
   ``computeD1.compute_D1`` (torch, ``slow`` tiled mode — its only mode
   that fits big N; reference: baselines/classic_video_textures/
   computeD1.py:47-96) on CPU, vs ``avtex.ops.pairwise.pairwise_l2_pallas``
   on the attached TPU, identical [N, F] float32 inputs.
2. **Per-transition scoring (contrastive synthesis)**: the reference
   re-embeds EVERY segment at EVERY step (validate.py:441-522); avtex
   embeds once and scores each step with one [1,D]x[D,L] row. Both sides
   measured on the SAME hardware with the SAME avtex SlowFast model:
   cost(per-step re-encode) = full-table embed time, cost(avtex step) =
   the host walk's per-step time from the logit matrix.

Usage: python tools/measure_similarity_speedup.py [N] [F]
Prints one JSON line.
"""

import json
import sys
import time

import numpy as np


def time_reference_d1_cpu(feats: np.ndarray, batch_size: int = 256) -> float:
    """Run the reference's computeD1 (slow tiled mode) on torch CPU."""
    import types

    import torch

    def stub(name):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
            if "." in name:
                parent, child = name.rsplit(".", 1)
                stub(parent)
                setattr(sys.modules[parent], child, mod)
        return sys.modules[name]

    for m in ["librosa", "torchvision", "torchvision.io",
              "torchvision.models", "torchvision.transforms", "resampy",
              "soundfile"]:
        stub(m)
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.empty_cache = lambda: None
    sys.path.insert(0, "/root/reference/baselines/classic_video_textures")
    try:
        import computeD1
    finally:
        sys.path.pop(0)

    x = torch.tensor(feats.reshape(len(feats), -1))
    t0 = time.perf_counter()
    computeD1.compute_D1(x, 4.5, feats="RGB", slow=True,
                         batch_size=batch_size)
    return time.perf_counter() - t0


def time_pallas_d1_tpu(feats: np.ndarray, reps: int = 4) -> float:
    import jax
    import jax.numpy as jnp

    from avtex.ops.pairwise import pairwise_l2_pallas

    x = jnp.asarray(feats.reshape(len(feats), -1))
    np.asarray(pairwise_l2_pallas(x))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(pairwise_l2_pallas(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1800
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 12288  # 64x64x3 frames

    g = np.random.default_rng(0)
    feats = (g.random((N, F), dtype=np.float32) * 255.0)

    t_pallas = time_pallas_d1_tpu(feats)
    t_ref = time_reference_d1_cpu(feats)

    out = {
        "n_frames": N, "feat_dim": F,
        "reference_computeD1_cpu_s": round(t_ref, 3),
        "pallas_d1_tpu_s": round(t_pallas, 4),
        "d1_speedup": round(t_ref / t_pallas, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
