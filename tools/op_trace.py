"""Per-op device-time attribution for the SlowFast embed trunk.

Runs a truncation of the affine SlowFast program (max_stage, like
tools/embed_stage_bench.py) under jax.profiler, then parses the captured
XSpace proto (via tensorflow.tsl's xplane_pb2 — TF is baked into this
image) and aggregates device-side event durations by HLO op name. This is
how the stems' layout-copy overhead was localized in round 3; kept as a
tool because the remote-tunnel wall times cannot attribute anything below
whole-program granularity (CLAUDE.md: per-dispatch floor ~30 ms).

Usage: python tools/op_trace.py [--batch 64] [--max-stage 0] [--s2d 1]
       [--top 25]
"""

import argparse
import collections
import functools
import glob
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def parse_xspace(logdir: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    if not paths:
        print("no xplane.pb captured", file=sys.stderr)
        return
    xs = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = plane.event_metadata
        per_op = collections.Counter()
        counts = collections.Counter()
        total_ps = 0
        for line in plane.lines:
            # XLA Ops / steps lines both appear; keep op-level lines only.
            if line.name and "op" not in line.name.lower() \
                    and "XLA" not in line.name:
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name
                per_op[name] += ev.duration_ps
                counts[name] += 1
                total_ps += ev.duration_ps
        if not per_op:
            continue
        print(f"== plane {plane.name}: {total_ps / 1e9:.3f} ms total "
              f"device-op time")
        for name, ps in per_op.most_common(top):
            print(f"  {ps / 1e9:8.3f} ms  x{counts[name]:<3d} {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--max-stage", type=int, default=0)
    ap.add_argument("--s2d", type=int, default=1)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from avtex.nn.slowfast import SlowFastR50, slowfast_pathways

    g = np.random.default_rng(0)
    frames = jnp.asarray(g.random((args.batch, 32, args.res, args.res, 3))
                         * 0.5, jnp.bfloat16)
    slow, fast = slowfast_pathways(frames)
    full = SlowFastR50(norm="affine")
    shapes = jax.eval_shape(full.init, jax.random.key(0), slow, fast)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            g.standard_normal(s.shape).astype(np.float32) * 0.05), shapes)

    @functools.partial(jax.jit, static_argnames=("k", "s2d"))
    def run(p, s, f, k, s2d):
        m = SlowFastR50(norm="affine", max_stage=k, s2d_stem=s2d)
        return jnp.sum(m.apply(p, s, f).astype(jnp.float32))

    fetch = lambda x: float(np.asarray(x))  # noqa: E731
    t0 = time.perf_counter()
    fetch(run(params, slow, fast, args.max_stage, bool(args.s2d)))
    print(f"warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    fetch(run(params, slow, fast, args.max_stage, bool(args.s2d)))
    print(f"steady {(time.perf_counter() - t0) * 1e3:.1f} ms wall",
          file=sys.stderr)

    logdir = tempfile.mkdtemp(prefix="avtex_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(args.reps):
            fetch(run(params, slow, fast, args.max_stage, bool(args.s2d)))
    print(f"(divide by reps={args.reps} for per-run time)")
    parse_xspace(logdir, args.top)


if __name__ == "__main__":
    main()
