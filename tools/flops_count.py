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
    main()
