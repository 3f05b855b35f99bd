"""Classic video-textures pipeline benchmark at production scale on TPU.

Times every stage of the Schödl pipeline (D1 all-pairs Pallas kernel ->
D2 diagonal-binomial smoothing -> D3 anticipated-future-cost value
iteration -> texture walk) at the BASELINE production size the reference
cannot reach (its computeD1 materializes O(N²F) repeats; measured 231.8 s
on CPU at N=450 — tools/measure_similarity_speedup.py).

Usage: python tools/classic_bench.py [n_frames] [hw]
Prints one JSON line with per-stage seconds (best of 3 after warmup).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1800
    hw = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax.numpy as jnp

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from avtex.classic.d1 import compute_d1
    from avtex.classic.d2 import compute_d2
    from avtex.classic.future_cost import compute_d3
    from avtex.classic.sampler import sample_texture_walk_host

    g = np.random.default_rng(0)
    # Structured frames so the transition graph is non-degenerate.
    t = np.arange(N)[:, None, None]
    yy, xx = np.mgrid[0:hw, 0:hw]
    frames = np.clip(127 + 80 * np.sin(xx / 7.0 + t / 4.0)
                     * np.cos(yy / 9.0), 0, 255).astype(np.float32)
    frames = np.repeat(frames[..., None], 3, -1)
    feats = jnp.asarray(frames.reshape(N, -1))

    from avtex.classic.fused import classic_transition_matrix

    def run():
        # Staged attribution: each stage fetches its [N, N] fp32 matrix,
        # so these times INCLUDE ~13 MB of tunnel transfer per stage —
        # they attribute the staged API's wall cost, not device compute.
        times = {}
        t0 = time.perf_counter()
        d1, p1, _ = compute_d1(feats, 4.5)
        np.asarray(d1)
        times["d1_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        d2, p2, _ = compute_d2(d1, 4.5, filter_size=16)
        np.asarray(d2)
        times["d2_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        d3, p3, p3n, _ = compute_d3(d2, 4.5, thresholding=0.75)
        p3n_h = np.asarray(p3n)
        times["d3_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        idxs, jumps = sample_texture_walk_host(
            p3n_h, start=100, num_steps=900, rng=np.random.default_rng(0))
        times["walk_s"] = time.perf_counter() - t0
        times["total_staged_s"] = sum(times.values())

        # Fused path: ONE device program, ONE fetch of the final
        # thresholded matrix, then the host walk — the serving shape.
        t0 = time.perf_counter()
        p3n_f = np.asarray(classic_transition_matrix(feats, 4.5))
        times["fused_matrix_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        idxs_f, _ = sample_texture_walk_host(
            p3n_f, start=100, num_steps=900, rng=np.random.default_rng(0))
        times["total_s"] = (times["fused_matrix_s"]
                            + time.perf_counter() - t0)
        assert list(idxs_f) == list(idxs)  # identical math, one program

        # Full-device path: the matrix never leaves the device — fused
        # program + device lax.scan walk, fetch only the ~900 indices.
        import jax

        from avtex.classic.sampler import sample_texture_walk
        t0 = time.perf_counter()
        p3n_d = classic_transition_matrix(feats, 4.5)
        idx_d, _ = sample_texture_walk(p3n_d, 100, 900, jax.random.key(0))
        idx_d = np.asarray(idx_d)
        times["total_device_s"] = time.perf_counter() - t0
        assert len(idx_d) == 901 and (idx_d >= 0).all()
        return times, idxs

    run()  # warmup/compile
    best = None
    for _ in range(3):
        times, idxs = run()
        if best is None or times["total_s"] < best["total_s"]:
            best = times
    print(json.dumps({
        "metric": "classic_pipeline_1800f_s",
        "n_frames": N, "feat_dim": 3 * hw * hw,
        **{k: round(v, 4) for k, v in best.items()},
        "walk_len": len(idxs),
    }))


if __name__ == "__main__":
    main()
