"""In-process A/B of train-step variants (tunnel rules: interleaved,
scalar fetches, one process — CLAUDE.md).

Currently wired A/B: GroupNorm output dtype (bf16, the new default) vs
fp32 (pre-round-3). The knob is avtex.nn.resnet3d.GN_F32_OUT, read at
trace time; each variant gets its own make_train_step closure so both
programs live in one process.

Usage: python tools/train_ab.py [batch] [negs] [window] [reps]
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
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    import jax
    import jax.numpy as jnp

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from avtex.config import Config
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.nn import resnet3d
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
    state, tx = create_state(model, cfg, batch, steps_per_epoch=10,
                             slowfast=True)
    rng = jax.random.key(0)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}

    a = jnp.ones((1024, 1024), jnp.bfloat16)
    pf = jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))
    float(np.asarray(pf(a)))
    t0 = time.perf_counter()
    float(np.asarray(pf(a)))
    print(f"pool probe {(time.perf_counter() - t0) * 1e3:.1f} ms",
          file=sys.stderr)

    variants = {}
    for name, f32_out in (("gn_bf16", False), ("gn_f32", True)):
        resnet3d.GN_F32_OUT = f32_out
        step = make_train_step(model, tx, cfg.img_size, slowfast=True)
        tw = time.perf_counter()
        st, m = step(state, dev_batch, rng)
        loss0 = float(np.asarray(m["loss"]))
        print(f"warmup {name}: {time.perf_counter() - tw:.1f}s "
              f"loss {loss0:.4f}", file=sys.stderr, flush=True)
        variants[name] = step
    resnet3d.GN_F32_OUT = False

    times = {k: [] for k in variants}
    for r in range(reps):
        for name, step in variants.items():
            t0 = time.perf_counter()
            st, m = step(state, dev_batch, jax.random.fold_in(rng, r))
            _ = float(np.asarray(m["loss"]))
            times[name].append(time.perf_counter() - t0)
            print(f"rep {r} {name}: {times[name][-1] * 1e3:.1f} ms",
                  file=sys.stderr, flush=True)

    print(json.dumps({k: round(min(v) * 1e3, 1) for k, v in times.items()}))


if __name__ == "__main__":
    main()
