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
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
        # Category rollup: the program event (jit_*) measures whole-run
        # device time; op events attribute it (they overlap-sum higher
        # because async copies run concurrently with compute).
        cats = collections.Counter()
        for name, ps in per_op.items():
            if name.startswith("jit_"):
                cat = "[whole program]"
            else:
                base = name.split(" = ", 1)[0].lstrip("%")
                cat = base.rstrip("0123456789.").rstrip("-_")
                if "fusion" in cat:
                    # kind is in the RHS: fusion(...), kind=kLoop/kOutput
                    kind = ("kOutput" if "kind=kOutput" in name else
                            "kLoop" if "kind=kLoop" in name else "fusion")
                    cat = f"fusion:{kind}"
            cats[cat] += ps
        for cat, ps in cats.most_common(12):
            print(f"  cat {ps / 1e9:9.3f} ms  {cat}")
        for name, ps in per_op.most_common(top):
            print(f"  {ps / 1e9:8.3f} ms  x{counts[name]:<3d} {name}")


def make_trunk_runner(args):
    import jax
    import jax.numpy as jnp

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

    return lambda: float(np.asarray(
        run(params, slow, fast, args.max_stage, bool(args.s2d))))


def make_embed_runner(args):
    """The PRODUCTION embed step bench.py times: on-device window gather
    + preprocess + pathways + both towers, one jit (_embed_both_fn)."""
    import jax
    import jax.numpy as jnp

    from avtex.contrastive.model import ContrastiveTextures
    from avtex.synth.embeddings import _embed_both_fn

    g = np.random.default_rng(0)
    t_frames = 30 * 60
    video = jnp.asarray((g.random((t_frames, args.res, args.res, 3)) * 255)
                        .astype(np.uint8))
    W = 15
    model = ContrastiveTextures(arch="slowfast", model_type=1, temp=0.1,
                                norm="affine")
    x = jnp.zeros((args.batch, W, args.res, args.res, 3), jnp.uint8)
    from avtex.data.preprocess import preprocess_clip
    from avtex.nn.slowfast import slowfast_pathways
    sf = slowfast_pathways(preprocess_clip(x[:1], size=args.res,
                                           slowfast=True))
    t_in = tuple(p[:, None] for p in sf)
    shapes = jax.eval_shape(model.init, jax.random.key(0), sf, t_in)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            g.standard_normal(s.shape).astype(s.dtype) * 0.05), shapes)
    starts = jnp.asarray((np.arange(args.batch) * 6).astype(np.int32))
    run = _embed_both_fn(model, args.res, True, W)

    def call():
        q, t = run(params, video, starts, None)
        return float(np.asarray(jnp.sum(q) + jnp.sum(t)))
    return call


def make_train_runner(args):
    """The flagship train step (tools/train_step_bench.py geometry)."""
    import jax
    import jax.numpy as jnp

    from avtex.config import Config
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.train.loop import create_state, make_train_step

    bs, negs, window = args.batch, 3, 15
    cfg = Config(enc_arch="slowfast", model_type=1, batch_size=bs,
                 n_negs=negs)
    model = ContrastiveTextures(arch="slowfast", model_type=1,
                                temp=cfg.temp, remat=True)
    g = np.random.default_rng(0)
    batch = {
        "q_frames": (g.random((bs, window, args.res, args.res, 3)) * 255
                     ).astype(np.uint8),
        "t_frames": (g.random((bs, 1 + negs, window, args.res, args.res, 3))
                     * 255).astype(np.uint8),
    }
    state = create_state(model, cfg, batch, steps_per_epoch=10,
                             slowfast=True)
    step = make_train_step(model, args.res, slowfast=True)
    rng = jax.random.key(0)
    dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    holder = {"state": state, "i": 0}

    def call():
        holder["i"] += 1
        st, m = step(holder["state"], dev_batch,
                     jax.random.fold_in(rng, holder["i"]))
        holder["state"] = st
        return float(np.asarray(m["loss"]))
    return call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prog", choices=("trunk", "embed", "train"),
                    default="trunk")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--max-stage", type=int, default=0)
    ap.add_argument("--s2d", type=int, default=1)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    fn = {"trunk": make_trunk_runner, "embed": make_embed_runner,
          "train": make_train_runner}[args.prog](args)
    t0 = time.perf_counter()
    fn()
    print(f"warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    fn()
    print(f"steady {(time.perf_counter() - t0) * 1e3:.1f} ms wall",
          file=sys.stderr)

    logdir = tempfile.mkdtemp(prefix="avtex_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(args.reps):
            fn()
    print(f"(divide by reps={args.reps} for per-run time)")
    parse_xspace(logdir, args.top)


if __name__ == "__main__":
    main()
