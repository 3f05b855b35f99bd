"""Probe: can the device walk's compiled executable be persisted (AOT)?

VERDICT r2 #9 / NOTES_r2 "deferred": the persistent XLA cache never
serves the lax.scan walk program on this backend, so every fresh process
pays a minutes-long compile for the device walk — which is why the host
walk is the pipeline default. This probe answers, with data, whether
jax.experimental.serialize_executable can close that hole:

  phase serialize: jit(_walk).lower(...).compile() on a bucketed shape,
    time the compile, serialize the executable to disk.
  phase load (fresh process): deserialize_and_load + one run, timed.

Usage:
  python tools/walk_aot_probe.py serialize  # compile + persist
  python tools/walk_aot_probe.py load       # fresh-process restore + run
  python tools/walk_aot_probe.py both       # serialize, then load in a
                                            # child process
"""

import os
import pickle
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PATH = "/tmp/avtex_walk_aot.pkl"
L_BUCKET, STEPS = 128, 64


def build_args():
    """Dynamic args of _walk in positional order (num_steps is static and
    passed separately); audio_logits=None stays in the pytree."""
    import jax
    import jax.numpy as jnp
    g = np.random.default_rng(0)
    q = jnp.asarray(g.random((L_BUCKET, 32)), jnp.float32)
    t = jnp.asarray(g.random((L_BUCKET, 32)), jnp.float32)
    return (q, t, jnp.asarray(97), 0.1, None, 5, 0.5, 0.5,
            jax.random.key(0))


def serialize():
    import jax
    from jax.experimental import serialize_executable

    from avtex.synth.engine import _walk

    args = build_args()
    t0 = time.perf_counter()
    lowered = jax.jit(
        _walk.__wrapped__, static_argnames=("num_steps",)).lower(
        *args[:6], num_steps=STEPS, alpha=args[6], threshold=args[7],
        rng=args[8])
    compiled = lowered.compile()
    t_compile = time.perf_counter() - t0
    print(f"compile: {t_compile:.1f}s")

    t0 = time.perf_counter()
    payload = serialize_executable.serialize(compiled)
    blob = pickle.dumps(payload)
    with open(PATH, "wb") as f:
        f.write(blob)
    print(f"serialize: {time.perf_counter() - t0:.2f}s, "
          f"{len(blob) / 1e6:.2f} MB")

    out = compiled(*args[:6], alpha=args[6], threshold=args[7],
                   rng=args[8])
    print("run ok:", np.asarray(out["idx"]).shape)


def pool_probe():
    """~30 ms healthy / can degrade 100x: 1024^2 matmul round trip."""
    import jax
    import jax.numpy as jnp
    a = jnp.ones((1024, 1024), jnp.bfloat16)
    f = jax.jit(lambda a: jnp.dot(a, a, preferred_element_type=jnp.bfloat16))
    np.asarray(f(a))
    t0 = time.perf_counter()
    np.asarray(f(a))
    print(f"pool probe: {(time.perf_counter() - t0) * 1000:.0f} ms",
          flush=True)


def load():
    import jax  # noqa: F401  (backend init)
    from jax.experimental import serialize_executable

    pool_probe()
    t0 = time.perf_counter()
    with open(PATH, "rb") as f:
        payload = pickle.loads(f.read())
    compiled = serialize_executable.deserialize_and_load(*payload)
    t_load = time.perf_counter() - t0
    print(f"deserialize_and_load: {t_load:.2f}s", flush=True)

    args = build_args()
    for tag in ("first", "second", "third"):
        t0 = time.perf_counter()
        out = compiled(*args[:6], alpha=args[6], threshold=args[7],
                       rng=args[8])
        idx = np.asarray(out["idx"])
        print(f"{tag} run: {time.perf_counter() - t0:.2f}s, idx {idx[:5]}",
              flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode in ("serialize", "both"):
        serialize()
    if mode == "load":
        load()
    if mode == "both":
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "load"],
            capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        print(proc.stdout.strip())
        if proc.returncode != 0:
            print("LOAD FAILED:", proc.stderr[-2000:])
