"""Unit tests for bench.py's backend-acquisition retry loop.

BENCH_r03.json was value:-1 because one transient ``Unable to initialize
backend 'axon'`` at t=0 forfeited the round's perf artifact; the retry
loop is the fix and must not regress. The real path (jax.devices through
the remote pool) cannot be exercised here, so the loop's clock/sleep/
reset seams are injected.
"""

import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from bench import _acquire_backend  # noqa: E402


def test_retries_until_backend_comes_up():
    calls = {"n": 0, "slept": [], "resets": 0}

    def devices():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("Unable to initialize backend 'axon': "
                               "UNAVAILABLE")
        return ["FakeDevice(0)"]

    out = _acquire_backend(
        budget_s=600.0,
        _devices_fn=devices,
        _sleep=lambda s: calls["slept"].append(s),
        _reset=lambda: calls.__setitem__("resets", calls["resets"] + 1),
        _probe_fn=lambda: True)
    assert out is not None
    assert calls["n"] == 3
    assert calls["slept"] == [60.0, 60.0]
    # each retry must clear the memoized failed init first
    assert calls["resets"] == 2


def test_gives_up_after_budget_and_propagates():
    clock = {"t": 0.0}

    def sleep(s):
        clock["t"] += s

    def devices():
        raise RuntimeError("Unable to initialize backend 'axon'")

    import time as _time
    real = _time.perf_counter
    _time.perf_counter = lambda: clock["t"]
    try:
        with pytest.raises(RuntimeError, match="axon"):
            _acquire_backend(budget_s=150.0, _devices_fn=devices,
                             _sleep=sleep, _reset=lambda: None,
                             _probe_fn=lambda: True)
    finally:
        _time.perf_counter = real
    # 0s fail -> sleep 60 -> fail -> sleep 60 -> fail at 120 -> sleep 60
    # -> 180 >= 150: raise
    assert clock["t"] == 180.0


def test_reset_failure_does_not_break_retry():
    calls = {"n": 0}

    def devices():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("init failed")
        return ["dev"]

    def bad_reset():
        raise OSError("clear_backends exploded")

    out = _acquire_backend(budget_s=600.0, _devices_fn=devices,
                           _sleep=lambda s: None, _reset=bad_reset,
                           _probe_fn=lambda: True)
    assert out is not None and calls["n"] == 2


def test_wedged_probe_retries_then_raises():
    """Init-HANG wedge mode: the liveness probe (hang-safe child) keeps
    failing -> retry with backoff, raise attributably at budget."""
    clock = {"t": 0.0}
    probes = {"n": 0}

    def probe():
        probes["n"] += 1
        return False

    import time as _time
    real = _time.perf_counter
    _time.perf_counter = lambda: clock["t"]
    try:
        with pytest.raises(RuntimeError, match="pool wedged"):
            _acquire_backend(
                budget_s=150.0,
                _devices_fn=lambda: ["dev"],
                _sleep=lambda s: clock.__setitem__("t", clock["t"] + s),
                _reset=lambda: None, _probe_fn=probe)
    finally:
        _time.perf_counter = real
    assert probes["n"] == 4  # 0s, 60s, 120s fail -> 180s >= 150: raise


def test_probe_timeout_escalates_and_caps():
    """Degraded-but-alive pools round-trip the probe in 1-3 min (91 s
    observed 2026-08-19); a fixed 150 s timeout classified them as wedged
    forever. Later attempts must stretch, bounded so the budget check
    still gets control."""
    from bench import _probe_timeout
    assert _probe_timeout(1) == 150.0
    assert _probe_timeout(2) == 300.0
    assert _probe_timeout(3) == 450.0
    assert _probe_timeout(10) == 450.0  # capped


def test_default_probe_path_passes_escalating_timeouts(monkeypatch):
    """The real (non-injected) probe path must feed _probe_timeout(n) to
    the child on the nth attempt."""
    import bench as bench_mod

    seen = []

    def fake_child(timeout_s=150.0):
        seen.append(timeout_s)
        return len(seen) >= 3  # wedged twice, then alive

    monkeypatch.setattr(bench_mod, "_backend_alive_child", fake_child)
    out = bench_mod._acquire_backend(
        budget_s=3600.0, _devices_fn=lambda: ["dev"],
        _sleep=lambda s: None, _reset=lambda: None)
    assert out is not None
    assert seen == [150.0, 300.0, 450.0]


def test_probe_timeout_capped_at_remaining_budget(monkeypatch):
    """A wedged pool must not overrun budget_s by a whole 450 s probe:
    each child timeout is capped at the remaining budget (ADVICE r4)."""
    import time as _time

    import bench as bench_mod

    clock = {"t": 0.0}
    seen = []

    def fake_child(timeout_s=150.0):
        seen.append(timeout_s)
        clock["t"] += timeout_s  # a wedged probe burns its whole timeout
        return False

    monkeypatch.setattr(bench_mod, "_backend_alive_child", fake_child)
    real = _time.perf_counter
    _time.perf_counter = lambda: clock["t"]
    try:
        with pytest.raises(RuntimeError, match="pool wedged"):
            bench_mod._acquire_backend(
                budget_s=200.0, _devices_fn=lambda: ["dev"],
                _sleep=lambda s: clock.__setitem__("t", clock["t"] + s),
                _reset=lambda: None)
    finally:
        _time.perf_counter = real
    # attempt 1: min(150, 200) = 150; sleep 60 -> t=210 >= 200: raise.
    assert seen == [150.0]
    # and with a budget below the first escalation step, the cap engages
    clock["t"] = 0.0
    seen.clear()
    _time.perf_counter = lambda: clock["t"]
    try:
        with pytest.raises(RuntimeError, match="pool wedged"):
            bench_mod._acquire_backend(
                budget_s=100.0, _devices_fn=lambda: ["dev"],
                _sleep=lambda s: clock.__setitem__("t", clock["t"] + s),
                _reset=lambda: None)
    finally:
        _time.perf_counter = real
    assert seen == [100.0]  # capped at the whole (remaining) budget


def test_watchdog_rearm_restarts_deadline(monkeypatch):
    """_rearm_watchdog must cancel the acquisition-era timer and start a
    fresh one with the full deadline (ADVICE r4: escalated probes can eat
    ~17 min of a fixed 1800 s deadline before measurement starts)."""
    import bench as bench_mod

    monkeypatch.setenv("AVTEX_BENCH_DEADLINE_S", "9999")
    bench_mod._arm_watchdog()
    first = bench_mod._WATCHDOG["timer"]
    assert first is not None and first.is_alive()
    try:
        bench_mod._rearm_watchdog()
        second = bench_mod._WATCHDOG["timer"]
        assert second is not first
        assert second.is_alive()
        assert first.finished.is_set()  # cancelled
        assert bench_mod._WATCHDOG["deadline"] == 9999.0
    finally:
        bench_mod._WATCHDOG["timer"].cancel()
        bench_mod._WATCHDOG["timer"] = None


def test_rearm_is_noop_when_watchdog_off():
    import bench as bench_mod

    bench_mod._WATCHDOG["timer"] = None
    bench_mod._rearm_watchdog()  # must not raise
    assert bench_mod._WATCHDOG["timer"] is None


def test_best_run_stats_uses_best_runs_embed_time():
    """MFU/clips-per-sec must be stamped from the run `value` reports
    (BENCH_r04 stamped the LAST run's table time against the MIN run's
    headline — different pool windows)."""
    from bench import _best_run_stats

    times = [3.567, 3.980, 1.140, 2.507]       # r4's actual runs
    tables = [3.2, 3.6, 0.996, 2.2]
    elapsed, median, embed, cps = _best_run_stats(times, tables, L=450,
                                                  n_chips=1)
    assert elapsed == 1.140
    assert embed == 0.996
    assert cps == pytest.approx(2 * 450 / 0.996)
    assert median == pytest.approx((2.507 + 3.567) / 2)


def test_probe_recovers_then_init_succeeds():
    probes = {"n": 0}

    def probe():
        probes["n"] += 1
        return probes["n"] >= 3  # wedged twice, then the pool clears

    out = _acquire_backend(budget_s=600.0, _devices_fn=lambda: ["dev"],
                           _sleep=lambda s: None, _reset=lambda: None,
                           _probe_fn=probe)
    assert out is not None and probes["n"] == 3
