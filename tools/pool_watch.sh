#!/bin/bash
# Opportunistic healthy-window bench harvester.
#
# The remote TPU pool cycles wedged/degraded/healthy roughly hourly, with
# healthy (probe < 45 ms) stretches lasting only minutes (NOTES_r5.md
# environment log). This watcher probes cheaply every PERIOD seconds and
# launches ONE bench.py run the moment a healthy window appears, then
# exits. It respects a host-CPU lockfile so it never overlaps a
# compile-heavy foreground job (single host core: XLA compiles serialize,
# CLAUDE.md "Environment gotchas").
#
# Usage: tools/pool_watch.sh <outdir> [max_seconds] [gate_ms]
set -u
OUT=${1:?outdir}
MAXS=${2:-21600}
GATE=${3:-45}
PERIOD=${4:-240}
LOCK=/tmp/avtex_cpu_busy
mkdir -p "$OUT"
stamp() { date +%H:%M:%S; }
log() { echo "$(stamp) $*" >> "$OUT/watch.log"; }

probe() {
  # Min-of-3 256^2 matmul round trips in ms; nonzero exit on hang/wedge.
  timeout 120 python - <<'EOF'
import time, sys
import jax, jax.numpy as jnp
import numpy as np
x = jnp.ones((256, 256), jnp.bfloat16)
best = 1e9
for _ in range(3):
    t0 = time.time()
    np.asarray(x @ x)
    best = min(best, (time.time() - t0) * 1e3)
print(f"{best:.1f}")
sys.exit(0 if best < 1e9 else 1)
EOF
}

log "watch start gate=${GATE}ms period=${PERIOD}s max=${MAXS}s"
t_end=$(( $(date +%s) + MAXS ))
while [ "$(date +%s)" -lt "$t_end" ]; do
  if [ -e "$LOCK" ]; then
    log "host busy ($LOCK present) — skipping probe"
    sleep "$PERIOD"; continue
  fi
  p=$(probe); rc=$?
  if [ $rc -ne 0 ] || [ -z "$p" ]; then
    log "probe hung/failed (rc=$rc) — pool wedged"
    sleep "$PERIOD"; continue
  fi
  log "probe ${p} ms"
  ok=$(python -c "print(1 if float('$p') < $GATE else 0)")
  if [ "$ok" = "1" ]; then
    if [ -e "$LOCK" ]; then log "healthy but host busy — waiting"; sleep 60; continue; fi
    log "HEALTHY window (${p} ms) — launching bench"
    touch "$LOCK.bench"
    timeout 2800 python bench.py > "$OUT/bench_healthy.json" 2> "$OUT/bench_healthy.err"
    rc=$?
    rm -f "$LOCK.bench"
    log "bench exit=$rc: $(tail -c 400 "$OUT/bench_healthy.json" 2>/dev/null)"
    if [ $rc -eq 0 ] && grep -q '"pool_degraded": false' "$OUT/bench_healthy.json"; then
      log "NON-DEGRADED bench captured — done"
      touch "$OUT/done_healthy"
      exit 0
    fi
    # Keep the best attempt; retry in later windows.
    n=$(ls "$OUT"/bench_attempt_*.json 2>/dev/null | wc -l)
    cp "$OUT/bench_healthy.json" "$OUT/bench_attempt_$((n+1)).json" 2>/dev/null
  fi
  sleep "$PERIOD"
done
log "watch budget exhausted"
exit 1
