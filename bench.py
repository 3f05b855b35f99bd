"""avtex benchmark: embed + score + synthesize a 1-min 30 fps video.

The BASELINE.json north star: embed and score a 1-minute 30 fps video and
synthesize the full texture in < 10 s on TPU (the reference re-encodes all
segments per transition — ~450 SlowFast forwards of ~600 frames for the
same output, SURVEY.md §6). This bench runs the whole device pipeline with
the flagship SlowFast-R50 encoder: both embedding tables over all segments,
the [L, L] logit matrix, and the full lax.scan transition walk.

Prints ONE JSON line:
  {"metric": "e2e_embed_score_synthesize_1min30fps_s", "value": <seconds>,
   "unit": "s", "vs_baseline": <north-star 10 s / value>}
"""

import json
import sys
import time

import numpy as np

# XLA HLO cost analysis of the exact embed program this bench dispatches
# (one clip through one tower incl. on-device window gather + preprocess;
# conv+dot FLOPs = 2*MACs). Measured by tools/flops_count.py on 2026-08-18:
# batch=1 both-towers program = 2.244e11 flops -> 1.122e11 per clip-forward.
FLOPS_PER_CLIP = 1.122e11

# Dense bf16 peak of the attached chip, for the MFU denominator.
# The pool's device_kind reports a v5e-class part (197 TFLOP/s bf16).
_PEAK_TFLOPS_BY_KIND = {"TPU v5 lite": 197.0, "TPU v5e": 197.0,
                        "TPU v4": 275.0, "TPU v5p": 459.0,
                        "TPU v6 lite": 918.0, "TPU v6e": 918.0}
PEAK_TFLOPS = 197.0


def _backend_alive_child(timeout_s: float = 150.0) -> bool:
    """Probe backend liveness in a KILLABLE child process.

    The pool has two distinct wedge modes (observed 2026-08-18): backend
    init fails fast (``Unable to initialize backend 'axon'``), or init
    simply HANGS — an in-process ``jax.devices()`` then blocks forever
    and no retry loop ever gets control. A child process converts the
    hang into a timeout we can retry. The child must also round-trip a
    tiny computation: init succeeding while fetches hang is a third
    observed mode.
    """
    import subprocess
    import sys as _sys

    code = ("import jax, jax.numpy as jnp, numpy as np; "
            "a = jnp.ones((256, 256), jnp.bfloat16); "
            "np.asarray(jax.jit(lambda x: x @ x)(a)); "
            "print('BACKEND_ALIVE', jax.devices()[0].platform)")
    try:
        proc = subprocess.run([_sys.executable, "-c", code],
                              capture_output=True, text=True,
                              timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"[bench] backend probe child hung (> {timeout_s:.0f}s) — "
              f"pool wedged at init/fetch", file=sys.stderr, flush=True)
        return False
    if proc.returncode == 0 and "BACKEND_ALIVE" in proc.stdout:
        return True
    print(f"[bench] backend probe child failed rc={proc.returncode}: "
          f"{proc.stderr.strip()[-300:]}", file=sys.stderr, flush=True)
    return False


def _probe_timeout(attempt: int) -> float:
    """Child-probe timeout for the Nth liveness attempt (escalating).

    150 s catches healthy pools fast; later attempts stretch to 450 s so
    a ~100x-degraded pool (CLAUDE.md; 91 s probe round trip observed
    2026-08-19) still gets classified alive and measured — the in-main
    health gate then stamps the run degraded rather than forfeiting it.
    """
    return min(150.0 * attempt, 450.0)


def _acquire_backend(budget_s: float = None, *, _devices_fn=None,
                     _sleep=time.sleep, _reset=None, _probe_fn=None):
    """Return jax with a live backend, retrying transient init failures.

    The remote pool's backend init can fail transiently OR hang outright
    (BENCH_r03.json died in seconds on ``Unable to initialize backend
    'axon'``; CLAUDE.md documents hours-scale wedges that clear). Phase
    1 probes liveness in a killable child until it sees a working
    round-trip (hang-safe). Phase 2 initializes in-process; JAX memoizes
    a failed init, so each retry must clear_backends() first. Budget:
    retry with 60 s backoff until ``budget_s`` (default 900, override
    AVTEX_BENCH_INIT_BUDGET_S) is spent, then raise so the error-line
    path records an attributable failure. The _-prefixed hooks exist
    for the unit test (tests/test_bench_unit.py).
    """
    import os

    import jax

    if budget_s is None:
        budget_s = float(os.environ.get("AVTEX_BENCH_INIT_BUDGET_S", "900"))

    def default_reset():
        import jax.extend as jex
        jex.backend.clear_backends()

    devices_fn = _devices_fn or jax.devices
    reset = _reset or default_reset
    t0 = time.perf_counter()
    if _probe_fn is None:
        # Escalate the child timeout across attempts: a degraded-but-ALIVE
        # pool can round-trip the probe in 1-3 min (91 s observed
        # 2026-08-19 while the fixed 150 s timeout kept classifying it as
        # wedged) — slow must not be indistinguishable from hung, or a
        # capturable degraded number is forfeited exactly like BENCH_r03.
        # Each timeout is also capped at the remaining budget so a wedged
        # pool cannot overrun budget_s by a whole 450 s probe (the budget
        # check runs between probes, not inside them; the 10 s floor
        # below means the LAST probe may still overshoot the budget by
        # up to 10 s — bounded, and a probe shorter than that cannot
        # distinguish alive from wedged anyway).
        _state = {"attempt": 0}

        def probe_fn():
            _state["attempt"] += 1
            remaining = budget_s - (time.perf_counter() - t0)
            if remaining <= 0:
                return False  # budget spent: let the loop's check raise
            return _backend_alive_child(
                timeout_s=max(min(_probe_timeout(_state["attempt"]),
                                  remaining), 10.0))
    else:
        probe_fn = _probe_fn

    while not probe_fn():
        if time.perf_counter() - t0 >= budget_s:
            raise RuntimeError(
                f"TPU backend unreachable: liveness probe failed for "
                f"{budget_s:.0f}s (remote pool wedged)")
        print("[bench] waiting 60 s before re-probing backend",
              file=sys.stderr, flush=True)
        _sleep(60.0)

    # Phase 2: in-process init, sharing the remaining budget.
    attempt = 0
    while True:
        attempt += 1
        try:
            devs = devices_fn()
            print(f"[bench] backend up (attempt {attempt}): "
                  f"{[str(d) for d in devs]}", file=sys.stderr, flush=True)
            return jax
        except Exception as e:  # noqa: BLE001 - init failures are opaque
            waited = time.perf_counter() - t0
            if waited >= budget_s:
                print(f"[bench] backend init failed after {attempt} "
                      f"attempts / {waited:.0f}s; giving up",
                      file=sys.stderr, flush=True)
                raise
            print(f"[bench] backend init attempt {attempt} failed "
                  f"({type(e).__name__}: {str(e)[:200]}); retrying in 60 s "
                  f"({waited:.0f}/{budget_s:.0f}s)",
                  file=sys.stderr, flush=True)
            _sleep(60.0)
            try:
                reset()
            except Exception:  # noqa: BLE001 - best-effort reset
                pass


def _best_run_stats(times, tables_s, L, n_chips):
    """Headline + throughput stamp from the SAME run (the best one).

    BENCH_r04's MFU was computed from whichever run happened LAST while
    ``value`` was the min over runs — in a swinging pool those describe
    different windows. Returns (elapsed_s, median_s, embed_best_s,
    clips_per_sec_per_chip), all derived from the min-total-time run.
    """
    best_i = int(np.argmin(times))
    elapsed = float(times[best_i])
    embed_best = float(tables_s[best_i])
    clips_per_sec_per_chip = 2 * L / embed_best / n_chips
    return elapsed, float(np.median(times)), embed_best, \
        clips_per_sec_per_chip


def main() -> None:
    jax = _acquire_backend()
    # acquisition may have consumed most of a fixed deadline via escalated
    # probes; restart the clock so the deadline budgets the measurement
    _rearm_watchdog()
    import jax.numpy as jnp

    from avtex.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from avtex.config import Config
    from avtex.contrastive.model import ContrastiveTextures
    from avtex.contrastive.segments import num_segments
    from avtex.synth.embeddings import precompute_embeddings_from_video
    from avtex.synth.engine import (num_synthesis_steps,
                                    synthesize_indices_host)
    from avtex.synth.stitcher import stitch_texture

    fps, seconds, res = 30, 60, 224
    cfg = Config(enc_arch="slowfast", model_type=1).derive_geometry(fps)
    W, S = cfg.window, cfg.stride  # 15, 6
    t_frames = fps * seconds

    rng = np.random.default_rng(0)
    # Synthetic but structured video (moving gradients), decode excluded.
    yy, xx = np.mgrid[0:res, 0:res]
    base = np.sin(xx / 17.0)[None] + np.cos(yy / 13.0)[None]
    phase = np.sin(np.arange(t_frames) / 9.0)
    video = np.clip(127 + 80 * base * phase[:, None, None], 0, 255)
    video = video[..., None].repeat(3, -1).astype(np.uint8)

    L = num_segments(len(video), W, S, "val")

    # norm="affine" is the flagship inference configuration: the reference
    # always embeds eval-mode with frozen BatchNorm (validate.py:72), which
    # IS a per-channel affine — and it is what pretrained imports produce
    # (avtex/utils/convert.py::convert_bn_folded).
    model = ContrastiveTextures(arch=cfg.enc_arch, model_type=1,
                                temp=cfg.temp, norm="affine")
    from avtex.data.preprocess import preprocess_clip
    from avtex.nn.slowfast import slowfast_pathways
    ti = time.perf_counter()
    x = preprocess_clip(jnp.asarray(video[None, :W]), size=res, slowfast=True)
    sf = slowfast_pathways(x)
    t_in = tuple(p[:, None] for p in sf)
    # Values are irrelevant for throughput: materialize the param tree from
    # eval_shape (no init-program compile, saves ~40-60 s of bench setup).
    shapes = jax.eval_shape(model.init, jax.random.key(0), sf, t_in)
    host_rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda s: jnp.asarray(
            host_rng.standard_normal(s.shape).astype(s.dtype) * 0.05),
        shapes)
    print(f"[bench] params ready {time.perf_counter() - ti:.1f}s",
          file=sys.stderr, flush=True)

    batch = 128  # measured sweet spot (see NOTES_r2)
    steps = num_synthesis_steps(seconds * fps, W, S)

    import os
    debug = os.environ.get("AVTEX_BENCH_DEBUG") == "1"
    # The decoded video lives on device for the whole session (one H2D
    # transfer at setup, like the reference's one .cuda() upload).
    video_dev = jnp.asarray(video)

    # Multi-chip: shard the segment axis over all devices (ICI mesh). The
    # single-chip path is the plain batched loop.
    mesh = None
    if (len(jax.devices()) > 1
            and os.environ.get("AVTEX_BENCH_MESH", "1") == "1"):
        from avtex.parallel import make_mesh
        mesh = make_mesh()
        print(f"[bench] mesh {dict(mesh.shape)}", file=sys.stderr, flush=True)

    table_time = [0.0]

    def tables():
        if mesh is not None:
            from avtex.parallel import sharded_embed_from_video
            q = sharded_embed_from_video(model, params, mesh, video_dev,
                                         W, S, L, tower="query",
                                         img_size=res)
            t = sharded_embed_from_video(model, params, mesh, video_dev,
                                         W, S, L, tower="target",
                                         img_size=res)
            return q, t
        return precompute_embeddings_from_video(
            model, params, video_dev, W, S, L, img_size=res,
            batch_size=batch)

    def run():
        ts = time.perf_counter()
        q, t = tables()
        jax.block_until_ready((q, t))
        table_time[0] = time.perf_counter() - ts
        if debug:
            print(f"[bench] tables {table_time[0]:.1f}s",
                  file=sys.stderr, flush=True)
        ts = time.perf_counter()
        # Pipeline-default host walk: one device matmul + one fetch of the
        # [L, L] logit matrix; per-step math is O(L) numpy.
        result = synthesize_indices_host(q, t, steps, temp=cfg.temp,
                                         threshold=0.5, seed_id=10,
                                         rng=np.random.default_rng(0))
        if debug:
            print(f"[bench] walk {time.perf_counter() - ts:.1f}s",
                  file=sys.stderr, flush=True)
        return result

    # Pool-health probe: this environment's TPU is a shared remote pool
    # whose throughput can degrade ~100x for hours; a 1024-matmul round
    # trip is ~30-70 ms when healthy. Recorded so a bad e2e number can be
    # attributed (see BASELINE.md / CLAUDE.md).
    probe_a = jnp.ones((1024, 1024), jnp.bfloat16)
    probe_f = jax.jit(lambda a: jnp.dot(a, a,
                                        preferred_element_type=jnp.bfloat16))
    np.asarray(probe_f(probe_a))

    def probe() -> float:
        ts = []
        for _ in range(3):
            tp = time.perf_counter()
            np.asarray(probe_f(probe_a))
            ts.append(time.perf_counter() - tp)
        return round(min(ts) * 1000, 1)

    # Gate on pool health: when the probe exceeds the ~45 ms degraded
    # threshold (healthy floor ~30 ms), wait and re-probe before measuring
    # so the headline is taken in a healthy window by construction. Budget:
    # ~6 min of waiting, then measure anyway and flag the run as degraded.
    probe_ms = probe()
    waited_s = 0.0
    while probe_ms > 45.0 and waited_s < 360.0:
        print(f"[bench] pool degraded ({probe_ms} ms > 45 ms); waiting 45 s",
              file=sys.stderr, flush=True)
        time.sleep(45.0)
        waited_s += 45.0
        probe_ms = probe()
    pool_degraded = probe_ms > 45.0
    print(f"[bench] pool probe {probe_ms} ms"
          + (f" (still degraded after {waited_s:.0f}s wait)"
             if pool_degraded else ""),
          file=sys.stderr, flush=True)

    # Warmup: compile embed + walk kernels (first TPU compile is slow).
    print(f"[bench] init done; warming up (L={L}, steps={steps})",
          file=sys.stderr, flush=True)
    tw = time.perf_counter()
    _ = run()
    print(f"[bench] warmup {time.perf_counter() - tw:.1f}s",
          file=sys.stderr, flush=True)

    # Best of 4 timed runs: the TPU attachment in this environment is a
    # shared remote pool whose queueing noise swamps run-to-run variance
    # (spreads of 7-19 s for identical work were observed); the minimum is
    # the system's capability, and all runs are reported in detail.
    times, tables_s = [], []
    for _ in range(4):
        t0 = time.perf_counter()
        result = run()
        stitched = stitch_texture(video, result.indices, W, S, sf=cfg.SF,
                                  interpolate=False)
        times.append(time.perf_counter() - t0)
        tables_s.append(table_time[0])

    assert len(stitched["frames"]) >= seconds * fps * 0.9
    elapsed, median_s, embed_best_s, clips_per_sec_per_chip = \
        _best_run_stats(times, tables_s, L,
                        len(jax.devices()) if mesh is not None else 1)
    global PEAK_TFLOPS
    PEAK_TFLOPS = _PEAK_TFLOPS_BY_KIND.get(
        jax.devices()[0].device_kind, PEAK_TFLOPS)
    print(json.dumps({
        "metric": "e2e_embed_score_synthesize_1min30fps_s",
        "value": round(elapsed, 4),
        "unit": "s",
        "vs_baseline": round(10.0 / elapsed, 3),
        "detail": {
            "segments": int(L),
            "steps": int(steps),
            "encoder": "slowfast_r50",
            "resolution": res,
            "devices": [str(d) for d in jax.devices()],
            "jumps": int(result.jumps.sum()),
            # BASELINE.json primary throughput metric (per chip: divide by
            # the mesh size when the multi-chip path ran)
            "clips_per_sec_per_chip": round(clips_per_sec_per_chip, 1),
            # embed time of the BEST run (the run `value` reports), plus
            # every run's embed time — MFU and the headline must describe
            # the same pool window
            "embed_tables_s": round(embed_best_s, 3),
            "embed_tables_s_runs": [round(x, 3) for x in tables_s],
            # MXU utilization of the embed stage. flops_per_clip is the
            # XLA HLO cost analysis of one single-clip SlowFast-R50@224
            # affine forward (tools/flops_count.py; conv+dot FLOPs, i.e.
            # 2*MACs). Peak is the per-chip dense bf16 figure for the
            # attached device kind.
            "flops_per_clip": FLOPS_PER_CLIP,
            "achieved_tflops_per_chip": round(
                clips_per_sec_per_chip * FLOPS_PER_CLIP / 1e12, 1),
            "mfu": round(clips_per_sec_per_chip * FLOPS_PER_CLIP
                         / PEAK_TFLOPS / 1e12, 3),
            "peak_tflops_assumed": PEAK_TFLOPS,
            "pool_probe_ms": probe_ms,
            "pool_degraded": pool_degraded,
            "median_s": round(median_s, 4),
            "runs_s": [round(x, 3) for x in times],
            # STATIC CITATION of a prior measurement (2026-08, round 2),
            # not measured in this run: similarity-stage multiplier vs the
            # reference's own code, produced by
            # tools/measure_similarity_speedup.py (see BASELINE.md):
            # reference computeD1 torch-CPU 231.8 s at N=450 vs Pallas
            # 0.30 s at N=1800 on this chip.
            "similarity_speedup_citation": {
                "ref_computeD1_cpu_n450_s": 231.8,
                "pallas_d1_n1800_s": 0.30,
                "lower_bound_x": 770,
                "measured": "2026-08 round 2",
            },
            # STATIC CITATIONS of round-3 measurements (not this run):
            "train_step_citation": {
                "slowfast224_20clip_step_s": 0.444,
                "train_clips_per_sec_per_chip": 45.0,
                "tool": "tools/train_ab.py",
                "measured": "2026-08 round 3",
            },
            "classic_pipeline_citation": {
                "full_device_1800f_s": 0.061,
                "tool": "tools/classic_bench.py",
                "measured": "2026-08 round 3",
            },
        },
    }))


_WATCHDOG = {"timer": None, "deadline": 0.0}


def _start_watchdog_timer(deadline: float):
    import os
    import threading

    def fire():
        print(json.dumps({"metric": "e2e_embed_score_synthesize_1min30fps_s",
                          "value": -1, "unit": "s", "vs_baseline": 0,
                          "error": f"pool_hang: no completion within "
                                   f"{deadline:.0f}s (remote pool wedged)"}),
              flush=True)
        os._exit(2)

    t = threading.Timer(deadline, fire)
    t.daemon = True
    t.start()
    return t


def _arm_watchdog() -> None:
    """Emit the error line ourselves if the pool hangs outright.

    The shared remote pool sometimes wedges completely (device transfers
    never return — observed for >1.5 h stretches, 2026-08). A hung run
    killed by an external timeout records NOTHING; this deadline prints
    an attributable error JSON and exits first. Healthy runs finish in
    2-4 min; degraded-but-alive runs in 10-20 — the default 1800 s only
    fires on a true hang. Override with AVTEX_BENCH_DEADLINE_S (0 = off).
    """
    import os
    deadline = float(os.environ.get("AVTEX_BENCH_DEADLINE_S", "1800"))
    if deadline <= 0:
        return
    _WATCHDOG["deadline"] = deadline
    _WATCHDOG["timer"] = _start_watchdog_timer(deadline)


def _rearm_watchdog() -> None:
    """Restart the deadline clock with the full deadline remaining.

    Backend acquisition can legitimately consume most of the init budget
    (default 900 s — the escalating probes are capped at whatever budget
    remains); counted against a fixed 1800 s deadline, that leaves too
    little for the degraded-but-alive measurement the escalation exists
    to capture. main() re-arms after acquisition so the deadline budgets
    the MEASUREMENT, while a hang during acquisition is still bounded by
    the original arm (acquisition is itself hang-safe: child probes time
    out and the budget raises). Consequence for callers: the process can
    legitimately live for init-budget + deadline (~2700 s at defaults) —
    any EXTERNAL timeout wrapped around bench.py must exceed that, or it
    will kill the run the re-arm exists to save (a SIGTERM still records
    an error line via the handler in __main__, but the measurement is
    forfeited). No-op when the watchdog is off.
    """
    t = _WATCHDOG.get("timer")
    if t is None:
        return
    t.cancel()
    _WATCHDOG["timer"] = _start_watchdog_timer(_WATCHDOG["deadline"])


def _install_sigterm_line() -> None:
    """Record an attributable error line even when killed from OUTSIDE.

    Runbooks and drivers wrap bench.py in ``timeout N``; if N is shorter
    than init-budget + re-armed deadline (see _rearm_watchdog), the
    external SIGTERM would otherwise end the process with NOTHING on
    stdout — the exact silent-death mode the in-process watchdog was
    built to prevent. The handler prints the error JSON and exits hard
    (os._exit: the main thread may be blocked inside a device fetch that
    never returns).
    """
    import os
    import signal

    def fire(signum, frame):
        print(json.dumps({"metric": "e2e_embed_score_synthesize_1min30fps_s",
                          "value": -1, "unit": "s", "vs_baseline": 0,
                          "error": "SIGTERM: killed externally (timeout "
                                   "wrapper shorter than init budget + "
                                   "watchdog deadline?)"}),
              flush=True)
        os._exit(3)

    signal.signal(signal.SIGTERM, fire)


if __name__ == "__main__":
    _arm_watchdog()
    _install_sigterm_line()
    try:
        main()
    except Exception as e:  # noqa: BLE001 - bench must always emit a line
        print(json.dumps({"metric": "e2e_embed_score_synthesize_1min30fps_s",
                          "value": -1, "unit": "s", "vs_baseline": 0,
                          "error": f"{type(e).__name__}: {e}"}))
        sys.exit(1)
