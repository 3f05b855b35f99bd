"""In-process A/B of train-step variants (tunnel rules: interleaved,
scalar fetches, one process — CLAUDE.md).

Modes (first arg):
  gn     GroupNorm output dtype: bf16 (the default) vs fp32 (pre-round-3).
         Knob: avtex.nn.resnet3d.GN_F32_OUT, read at trace time.
  remat  Structured rematerialization on the flagship step (VERDICT r4 #4):
           remat_full   blanket per-bottleneck nn.remat (the default) —
                        backward saves block inputs only, recomputes all
           remat_convs  policy=save_only_these_names("conv_out") — saves
                        every conv output, recomputes only norm/relu
           no_remat     remat=False (recompute-free upper-memory bound;
                        recorded as OOM if the chip can't hold it)
         Knob: avtex.nn.resnet3d.REMAT_POLICY + the model's remat flag.

Each variant gets its own make_train_step closure so all programs live in
one process; params trees are identical across variants so one state is
shared. Prints per-rep times to stderr and a best-time JSON line.

Usage: python tools/train_ab.py [mode] [batch] [negs] [window] [reps]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
    mode = "gn"
    if argv and argv[0] in ("gn", "remat"):
        mode = argv.pop(0)
    bs = int(argv[0]) if len(argv) > 0 else 4
    negs = int(argv[1]) if len(argv) > 1 else 3
    window = int(argv[2]) if len(argv) > 2 else 15
    reps = int(argv[3]) if len(argv) > 3 else 5

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
    state = create_state(model, cfg, batch, steps_per_epoch=10,
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

    # (name, setup) pairs: setup() flips the trace-time knobs and returns
    # the model whose step to build. Params trees are identical.
    if mode == "gn":
        def mk_gn(f32):
            def setup():
                resnet3d.GN_F32_OUT = f32
                resnet3d.REMAT_POLICY = None
                return model
            return setup
        variant_defs = [("gn_bf16", mk_gn(False)), ("gn_f32", mk_gn(True))]
    else:
        model_noremat = ContrastiveTextures(arch="slowfast", model_type=1,
                                            temp=cfg.temp, remat=False)

        def mk_remat(policy, m):
            def setup():
                resnet3d.GN_F32_OUT = False
                resnet3d.REMAT_POLICY = policy
                return m
            return setup
        save_convs = jax.checkpoint_policies.save_only_these_names(
            "conv_out")
        variant_defs = [
            ("remat_full", mk_remat(None, model)),
            ("remat_convs", mk_remat(save_convs, model)),
            ("no_remat", mk_remat(None, model_noremat)),
        ]

    variants = {}
    failed = {}
    for name, setup in variant_defs:
        m = setup()
        step = make_train_step(m, cfg.img_size, slowfast=True)
        tw = time.perf_counter()
        try:
            st, mtr = step(state, dev_batch, rng)
            loss0 = float(np.asarray(mtr["loss"]))
        except Exception as e:  # e.g. RESOURCE_EXHAUSTED for no_remat
            failed[name] = f"{type(e).__name__}: {str(e)[:200]}"
            print(f"warmup {name}: FAILED {failed[name]}",
                  file=sys.stderr, flush=True)
            continue
        print(f"warmup {name}: {time.perf_counter() - tw:.1f}s "
              f"loss {loss0:.4f}", file=sys.stderr, flush=True)
        variants[name] = (setup, step)
    resnet3d.GN_F32_OUT = False
    resnet3d.REMAT_POLICY = None

    times = {k: [] for k in variants}
    for r in range(reps):
        for name, (setup, step) in variants.items():
            setup()  # knobs only matter at trace time; kept for clarity
            t0 = time.perf_counter()
            st, mtr = step(state, dev_batch, jax.random.fold_in(rng, r))
            _ = float(np.asarray(mtr["loss"]))
            times[name].append(time.perf_counter() - t0)
            print(f"rep {r} {name}: {times[name][-1] * 1e3:.1f} ms",
                  file=sys.stderr, flush=True)
    resnet3d.GN_F32_OUT = False
    resnet3d.REMAT_POLICY = None

    out = {k: round(min(v) * 1e3, 1) for k, v in times.items()}
    out.update({k: f"FAILED {v}" for k, v in failed.items()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
