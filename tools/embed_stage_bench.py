"""Attribute the SlowFast affine embed's device time to its stages.

Closes NOTES_r2 "consequences" #1 (end-to-end s2d fast tower) with data:
before building a layout change for the small-channel fast stages, measure
where the batch-128 embed's ~212 ms actually lives. Variants are the trunk
truncated after stage k (SlowFastR50.max_stage, an exact prefix of the
full program), timed interleaved in ONE process with scalar fetches
(tunnel rules — CLAUDE.md). Stage cost = delta between consecutive
truncations, measured in the *full-graph* context XLA actually schedules.

Also prints a bandwidth model per fast-stage: the fast tower's post-stem
stages run at arithmetic intensity ~4-36 FLOP/byte (channels 8-64), far
below the ~240 FLOP/byte MXU ridge on v5e — if their measured deltas sit
near the HBM roofline (bytes / ~819 GB/s), no lane-packing/layout
re-expression can win and NOTES_r2 #1 is closed.

Usage: python tools/embed_stage_bench.py [--batch 64] [--reps 6]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    return float(np.asarray(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--res", type=int, default=224)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from avtex.nn.slowfast import SlowFastR50, slowfast_pathways

    print(f"devices: {jax.devices()}", file=sys.stderr)
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    pf = jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))
    fetch(pf(a))
    t0 = time.perf_counter()
    fetch(pf(a))
    print(f"pool probe {(time.perf_counter() - t0) * 1e3:.1f} ms",
          file=sys.stderr)

    g = np.random.default_rng(0)
    b, res = args.batch, args.res
    frames = jnp.asarray(g.random((b, 32, res, res, 3)) * 0.5, jnp.bfloat16)
    slow, fast = slowfast_pathways(frames)

    # One param tree from the FULL model serves every truncation (flax
    # ignores unused params at apply).
    full = SlowFastR50(norm="affine")
    shapes = jax.eval_shape(full.init, jax.random.key(0), slow, fast)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            g.standard_normal(s.shape).astype(np.float32) * 0.05), shapes)

    import functools

    @functools.partial(jax.jit, static_argnames=("k", "s2d"))
    def run(p, s, f, k, s2d=True):
        m = SlowFastR50(norm="affine", max_stage=k, s2d_stem=s2d)
        return jnp.sum(m.apply(p, s, f).astype(jnp.float32))

    variants = {f"stage<={k - 1}" if k else "stems": (lambda k=k: run(
        params, slow, fast, k)) for k in range(5)}
    # In-process A/B of the s2d stem re-expression (both stems dense vs
    # both fused; one param tree serves both by construction).
    variants["stems_dense"] = lambda: run(params, slow, fast, 0, s2d=False)
    variants["full_dense_stems"] = lambda: run(params, slow, fast, 4,
                                               s2d=False)

    # A/B the de-s2d pool implementation (module-global read at trace
    # time; setting it before every call pins the first-trace behavior,
    # later calls are cache hits keyed by the distinct jit closure).
    from avtex.ops import s2d_stem as _s2d

    def pool_variant(k, impl):
        m = jax.jit(lambda p, s, f, _k=k: jnp.sum(SlowFastR50(
            norm="affine", max_stage=_k).apply(p, s, f).astype(jnp.float32)))

        def call():
            _s2d.POOL_IMPL = impl
            return m(params, slow, fast)
        return call

    variants["stems_slice9"] = pool_variant(0, "slice9")
    variants["full_slice9"] = pool_variant(4, "slice9")

    # A/B the fast-stem s2d factor (default 4; 8 measured a wash, kept
    # opt-in — see avtex/ops/s2d_stem.py).
    def stem_f_variant(k, fval):
        m = jax.jit(lambda p, s, f, _k=k: jnp.sum(SlowFastR50(
            norm="affine", max_stage=_k).apply(p, s, f).astype(jnp.float32)))

        def call():
            _s2d.POOL_IMPL = "rw"
            _s2d.STEM_F = fval
            try:
                return m(params, slow, fast)
            finally:
                _s2d.STEM_F = None
        return call

    variants["stems_f8"] = stem_f_variant(0, 8)
    variants["full_f8"] = stem_f_variant(4, 8)

    for name, fn in variants.items():
        tw = time.perf_counter()
        fetch(fn())
        print(f"warmup {name}: {time.perf_counter() - tw:.1f}s",
              file=sys.stderr, flush=True)

    times = {k: [] for k in variants}
    for rep in range(args.reps):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            fetch(fn())
            dt = time.perf_counter() - t0
            times[name].append(dt)
            print(f"rep {rep} {name}: {dt * 1e3:.1f} ms", file=sys.stderr,
                  flush=True)

    mins = {k: min(v) * 1e3 for k, v in times.items()}
    print({k: f"{v:.1f} ms" for k, v in mins.items()})
    names = list(mins)
    for prev, cur in zip(names, names[1:]):
        print(f"delta {cur}: {mins[cur] - mins[prev]:+.1f} ms")


if __name__ == "__main__":
    main()
