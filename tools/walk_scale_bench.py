"""Long-video walk scale proof on hardware (VERDICT r4 #8).

Times the host walk vs the bucketed device lax.scan (AOT-served,
avtex/utils/aot.py) at long-video sizes the reference cannot reach —
its per-step scoring re-encodes every segment (validate.py:441-522),
so L=2048+ never materializes there at all. Tables are synthetic
(the walk's cost depends only on [L, D] shapes); each timing fetches
results to host (tunnel rule: block_until_ready can't be trusted).

Prints one JSON line: per-L host/device best-of-3 seconds, the AOT
compile-vs-load split for the device walk, and a pool-probe stamp so
the numbers are attributable to a pool state.

Usage: python tools/walk_scale_bench.py [L ...] [--steps N] [--dim D]
       (defaults: L in {297, 2048, 4096}, steps=299, D=2304)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("lengths", nargs="*", type=int,
                    default=[297, 2048, 4096])
    ap.add_argument("--steps", type=int, default=299)
    ap.add_argument("--dim", type=int, default=2304)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from avtex.synth.engine import (synthesize_indices,
                                    synthesize_indices_host)

    a = jnp.ones((1024, 1024), jnp.bfloat16)
    pf = jax.jit(lambda a: jnp.sum((a @ a).astype(jnp.float32)))
    float(np.asarray(pf(a)))
    t0 = time.perf_counter()
    float(np.asarray(pf(a)))
    probe_ms = (time.perf_counter() - t0) * 1e3
    print(f"pool probe {probe_ms:.1f} ms", file=sys.stderr, flush=True)

    out = {"steps": args.steps, "dim": args.dim,
           "pool_probe_ms": round(probe_ms, 1), "sizes": {}}
    g = np.random.default_rng(0)
    for L in args.lengths:
        # L2-normalized tables, like the real embed output.
        q = g.standard_normal((L, args.dim)).astype(np.float32)
        t = g.standard_normal((L, args.dim)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        t /= np.linalg.norm(t, axis=1, keepdims=True)
        qd, td = jnp.asarray(q), jnp.asarray(t)

        row = {}
        # Device walk: first call pays AOT load or compile (recorded),
        # then best-of-3 warm.
        tc = time.perf_counter()
        r0 = synthesize_indices(qd, td, args.steps, temp=0.1,
                                threshold=0.2, rng=jax.random.key(0))
        row["device_first_s"] = round(time.perf_counter() - tc, 3)
        dev = []
        for rep in range(3):
            tc = time.perf_counter()
            r1 = synthesize_indices(qd, td, args.steps, temp=0.1,
                                    threshold=0.2,
                                    rng=jax.random.key(rep))
            dev.append(time.perf_counter() - tc)
        row["device_s"] = round(min(dev), 3)

        host = []
        for rep in range(3):
            tc = time.perf_counter()
            r2 = synthesize_indices_host(
                q, t, args.steps, temp=0.1, threshold=0.2,
                rng=np.random.default_rng(rep))
            host.append(time.perf_counter() - tc)
        row["host_s"] = round(min(host), 3)
        assert np.isfinite(r1.entropies).all() and len(r1.indices) == \
            args.steps and len(r2.indices) == args.steps
        out["sizes"][str(L)] = row
        print(f"L={L}: {row}", file=sys.stderr, flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
