"""Flagship SlowFast-R50 train-step benchmark on TPU (VERDICT round-2 #8).

AOT-compiles the full InfoNCE train step (augment + dual-tower SlowFast
forward + backward + SGD) at the given batch geometry, reports compile
time and best-of-N step wall-clock, and prints one JSON line. The XLA
persistent cache (avtex.utils.cache) makes recompiles cheap per topology.

Usage: python tools/train_step_bench.py [batch] [negs] [window]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    negs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    window = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    import jax
    import jax.numpy as jnp

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from avtex.config import Config
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.train.loop import create_state, make_train_step

    cfg = Config(enc_arch="slowfast", model_type=1, batch_size=bs,
                 n_negs=negs)
    model = ContrastiveTextures(arch="slowfast", model_type=1,
                                temp=cfg.temp, remat=True)

    g = np.random.default_rng(0)
    batch = {
        "q_frames": (g.random((bs, window, 224, 224, 3)) * 255
                     ).astype(np.uint8),
        "t_frames": (g.random((bs, 1 + negs, window, 224, 224, 3)) * 255
                     ).astype(np.uint8),
    }

    t0 = time.perf_counter()
    state = create_state(model, cfg, batch, steps_per_epoch=10,
                             slowfast=True)
    init_s = time.perf_counter() - t0

    step = make_train_step(model, cfg.img_size, slowfast=True)
    rng = jax.random.key(0)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    t0 = time.perf_counter()
    state, m = step(state, dev_batch, rng)
    loss0 = float(m["loss"])  # forces completion
    compile_s = time.perf_counter() - t0

    times = []
    for i in range(6):
        t0 = time.perf_counter()
        state, m = step(state, dev_batch, jax.random.fold_in(rng, i))
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    clips = bs * (2 + negs)
    print(json.dumps({
        "arch": "slowfast_r50_224", "batch": bs, "negs": negs,
        "window": window, "clips_per_step": clips,
        "init_s": round(init_s, 1),
        "compile_plus_first_step_s": round(compile_s, 1),
        "step_s_best": round(best, 4),
        "train_clips_per_sec": round(clips / best, 1),
        "first_loss": round(loss0, 4),
        "runs_s": [round(t, 3) for t in times],
    }))


if __name__ == "__main__":
    main()
