"""Probe: does int8 help the frozen-affine embed path on this TPU?

The embed path is MXU-lane-bound (BASELINE.md "MFU and the compiler
ceiling"): the SlowFast fast pathway's 8-64-channel 3D convs underfill
the 128-lane MXU. int8 could help only if XLA emits int8 convs at the
MXU's double int8 rate AT THESE SHAPES. This probe A/Bs, interleaved in
one process (the only trustworthy comparison through the remote pool):

  1. representative SlowFast conv shapes: bf16 conv vs int8 conv
     (both operands quantized, int32 accumulation);
  2. a 2048^2 matmul bf16 vs int8 (sanity: the chip's int8 rate is
     reachable at all).

Each timing fetches the result to host (block_until_ready is unreliable
through the tunnel). A pool probe gates the run.

Run: python tools/quant_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, reps=5):
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1000


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    # pool gate
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    pf = jax.jit(lambda a: jnp.dot(a, a,
                                   preferred_element_type=jnp.bfloat16))
    probe = timed(pf, a, reps=3)
    print(f"pool probe {probe:.1f} ms"
          + (" [DEGRADED >45ms — numbers unreliable]" if probe > 45 else ""))

    rng = np.random.default_rng(0)

    # sanity: big matmul, bf16 vs int8
    m = 4096
    xb = jnp.asarray(rng.standard_normal((m, m)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 127, (m, m)), jnp.int8)
    f_b = jax.jit(lambda x: lax.dot(x, x, preferred_element_type=jnp.bfloat16))
    f_i = jax.jit(lambda x: lax.dot(x, x, preferred_element_type=jnp.int32))
    tb, ti = timed(f_b, xb), timed(f_i, xi)
    print(f"matmul {m}^2: bf16 {tb:.1f} ms  int8 {ti:.1f} ms  "
          f"ratio {tb / ti:.2f}x")

    # representative SlowFast convs (NDHWC): fast-pathway 3x1x1 temporal
    # (32ch), fast 1x3x3 spatial (32ch), slow bottleneck 1x3x3 (128ch),
    # slow wide 1x1x1 contraction (1024->256).
    cases = [
        ("fast 3x1x1 C32", (8, 32, 28, 28, 32), (3, 1, 1, 32, 32)),
        ("fast 1x3x3 C32", (8, 32, 28, 28, 32), (1, 3, 3, 32, 32)),
        ("slow 1x3x3 C128", (8, 8, 28, 28, 128), (1, 3, 3, 128, 128)),
        ("slow 1x1x1 1024->256", (8, 8, 14, 14, 1024), (1, 1, 1, 1024, 256)),
    ]
    dn = lax.conv_dimension_numbers((1, 1, 1, 1, 1), (1, 1, 1, 1, 1),
                                    ("NDHWC", "DHWIO", "NDHWC"))
    for name, xs, ws in cases:
        xb = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        wb = jnp.asarray(rng.standard_normal(ws), jnp.bfloat16)
        xi = jnp.asarray(rng.integers(-127, 127, xs), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, ws), jnp.int8)

        def conv(x, w, acc):
            return lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=acc)

        f_b = jax.jit(lambda x, w: conv(x, w, jnp.bfloat16))
        f_i = jax.jit(lambda x, w: conv(x, w, jnp.int32))
        try:
            tb = timed(f_b, xb, wb)
            ti = timed(f_i, xi, wi)
            print(f"conv {name}: bf16 {tb:.2f} ms  int8 {ti:.2f} ms  "
                  f"ratio {tb / ti:.2f}x")
        except Exception as e:  # int8 convs may be unsupported outright
            print(f"conv {name}: int8 FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})")


if __name__ == "__main__":
    main()
