"""A/B the whole-stage Pallas kernel vs XLA's native conv path on TPU.

Target (VERDICT r2 #3): slow-res3 at embed batch 104 — [832, 56, 56, 320]
-> [832, 28, 28, 512] — where round 2 measured: fused k=1 103 ms, XLA
dot-general 139 ms, XLA native convs 52 ms. The k>1 row-concatenated
kernel must beat 52 ms to enter the model path.

All variants run interleaved in ONE process (pool noise makes
cross-process numbers meaningless — CLAUDE.md). Timings fetch a scalar
to host (block_until_ready does not reliably wait through the tunnel).

Usage: python tools/stage_bench.py [--bt 832] [--reps 6] [--ks 1,2,4,8]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fetch(x):
    """Force completion + host round trip of a (jit-produced) scalar."""
    return float(np.asarray(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bt", type=int, default=832)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--ks", default="1,2,4,8")
    ap.add_argument("--cin", type=int, default=320)
    ap.add_argument("--f", type=int, default=128)
    ap.add_argument("--hw", type=int, default=56)
    ap.add_argument("--blocks", type=int, default=4)
    ap.add_argument("--eager", action="store_true")
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import flax.linen as nn

    from avtex.nn.slowfast import SFBottleneck
    from avtex.ops.stage_fused import fused_stage, stage_weights_from_params

    print(f"devices: {jax.devices()}", file=sys.stderr)

    # pool probe
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    pf = jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))
    fetch(pf(a))
    t0 = time.perf_counter()
    fetch(pf(a))
    print(f"pool probe {(time.perf_counter() - t0) * 1e3:.1f} ms",
          file=sys.stderr)

    f, cin, hw, n_blocks = args.f, args.cin, args.hw, args.blocks
    cout = 4 * f

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(n_blocks):
                x = SFBottleneck(f, 1, 2 if i == 0 else 1,
                                 dtype=jnp.bfloat16, norm="affine",
                                 fuse=False,
                                 name=f"SFBottleneck_{2 * i}")(x)
            return x

    g = np.random.default_rng(0)
    x5 = jnp.asarray(g.random((args.bt, 1, hw, hw, cin), np.float32) * 0.5,
                     jnp.bfloat16)
    m = Stage()
    params = jax.jit(m.init)(jax.random.key(0), x5)
    params = jax.tree.map(
        lambda a: jnp.asarray(
            g.standard_normal(a.shape).astype(np.float32) * 0.05
            + (1.0 if a.ndim == 1 else 0.0)), params)

    # Everything (pallas_call prep ops included) under ONE jit per
    # variant, reduced to a scalar IN-GRAPH: eager ops and bulk fetches
    # are pathological through the remote tunnel (CLAUDE.md).
    import functools

    blocks = stage_weights_from_params(params, [2 * i for i in
                                                range(n_blocks)])
    x4 = x5.reshape((args.bt, hw, hw, cin))

    @jax.jit
    def run_xla(p, x):
        return jnp.sum(m.apply(p, x).astype(jnp.float32))

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_fused(x, bl, k):
        out = fused_stage(x, bl, stride=2, slices_per_step=k)
        return jnp.sum(out.astype(jnp.float32))

    variants = {"xla_conv": lambda: run_xla(params, x5)}
    for k in [int(s) for s in args.ks.split(",")]:
        if args.bt % k:
            continue
        variants[f"fused_k{k}"] = lambda k=k: run_fused(x4, blocks, k)

    if args.eager:
        # round-2 methodology: dispatch the pallas_call OUTSIDE any outer
        # jit (no XLA relayouts around the custom call); sum via a small
        # jitted reduce, fetch the scalar
        sum_dev = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
        x4d = jax.device_put(x4)
        blocks_d = jax.device_put(blocks)
        variants["fused_k1_eager"] = lambda: sum_dev(
            fused_stage(x4d, blocks_d, stride=2, slices_per_step=1))

    # correctness cross-check — device-side compare, scalar fetch only
    first_k = int(args.ks.split(",")[0])

    @jax.jit
    def check(p, x, bl):
        want = m.apply(p, x).reshape(args.bt, hw // 2, hw // 2, cout)
        got = fused_stage(x.reshape(args.bt, hw, hw, cin), bl, stride=2,
                          slices_per_step=first_k)
        d = jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))
        return jnp.max(d), jnp.max(jnp.abs(want.astype(jnp.float32)))

    if not args.no_check:
        err, mx = (float(np.asarray(v)) for v in check(params, x5, blocks))
        print(f"max |fused_k{first_k} - xla| = {err:.4f} "
              f"(rel {err / mx:.5f}, |want|max {mx:.2f})",
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

    print({k: f"{min(v) * 1e3:.1f} ms (min of {len(v)})"
           for k, v in times.items()})


if __name__ == "__main__":
    main()
