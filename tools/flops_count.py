"""One-off: XLA HLO cost analysis of the flagship embed program.

Counts the FLOPs of one single-clip SlowFast-R50@224 affine forward —
the exact program bench.py's table build dispatches (_embed_both_fn:
on-device window gather + preprocess + both towers) — by compiling it
on CPU and reading the backend's cost analysis. Both towers run per
dispatch, so flops_per_clip = total / (2 * batch).

The result is baked into bench.py as FLOPS_PER_CLIP so the bench can
report achieved TFLOP/s and MFU without paying a CPU compile per run.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/flops_count.py
"""

import os
import sys
import time

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main_train() -> None:
    """--train: FLOPs of one flagship TRAIN step (SlowFast@224, remat,
    GroupNorm, bs=4 negs=3 W=15 — the tools/train_step_bench.py geometry
    whose 0.444 s/step is the BASELINE.md headline). Note remat recompute
    IS counted by the cost analysis (it is in the HLO), so flops/step
    here divided by the measured step time is honest achieved FLOP/s."""
    import jax
    jax.config.update("jax_platforms", "cpu")

    from avtex.config import Config
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.train.loop import create_state, make_train_step

    rng = np.random.default_rng(0)
    bs, negs, W, res = 4, 3, 15, 224
    cfg = Config(enc_arch="slowfast", model_type=1, img_size=res, window=W,
                 stride=6, train_stride=6, n_negs=negs, batch_size=bs,
                 lr=0.01)
    model = ContrastiveTextures(arch="slowfast", model_type=1,
                                temp=cfg.temp, remat=True)
    batch = {
        "q_frames": (rng.random((bs, W, res, res, 3)) * 255)
        .astype(np.uint8),
        "t_frames": (rng.random((bs, negs + 1, W, res, res, 3)) * 255)
        .astype(np.uint8),
        "q_ids": np.arange(bs),
    }
    state = create_state(model, cfg, batch, 10, slowfast=True)
    step = make_train_step(model, res, slowfast=True)
    import jax.numpy as jnp
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    t0 = time.perf_counter()
    compiled = step.lower(state, dev_batch, jax.random.key(0)).compile()
    print(f"compiled in {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca["flops"])
    clips = bs * (negs + 2)  # queries + (negs+1) targets per sample
    print(f"train-step flops (bs={bs}, negs={negs}, {clips} clip-forwards "
          f"incl. remat recompute): {flops:.4g}")
    print(f"flops_per_step = {flops:.4g}")


def main() -> None:
    import jax  # noqa: E402
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: E402

    from avtex.contrastive.model import ContrastiveTextures
    from avtex.synth.embeddings import _embed_both_fn

    res, W, B = 224, 15, 1
    model = ContrastiveTextures(arch="slowfast", model_type=1, temp=0.1,
                                norm="affine")
    rng = np.random.default_rng(0)
    video = jnp.asarray((rng.random((W + 4, res, res, 3)) * 255)
                        .astype(np.uint8))
    starts = jnp.zeros((B,), jnp.int32)

    from avtex.data.preprocess import preprocess_clip
    from avtex.nn.slowfast import slowfast_pathways
    x = preprocess_clip(video[None, :W], size=res, slowfast=True)
    sf = slowfast_pathways(x)
    shapes = jax.eval_shape(model.init, jax.random.key(0), sf,
                            tuple(p[:, None] for p in sf))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    run = _embed_both_fn(model, res, True, W)
    t0 = time.perf_counter()
    compiled = run.lower(params, video, starts, None).compile()
    print(f"compiled in {time.perf_counter() - t0:.0f}s", file=sys.stderr)
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca["flops"])
    print(f"total flops (batch={B}, both towers): {flops:.4g}")
    print(f"flops_per_clip = {flops / (2 * B):.4g}")


if __name__ == "__main__":
    if "--train" in sys.argv:
        main_train()
    else:
        main()
