#!/bin/bash
# Tunnel-recovery watcher: probe the TPU backend in a disposable child with a
# hard timeout (the tunnel wedges for hours if a client dies mid-COMPILE, so
# probes only ever die during backend INIT, which is safe); the moment the
# backend answers, run the full chip measurement suite UNBOUNDED (never
# timeout-kill a compiling client) and exit.
#
# Usage: bash scripts/recovery_loop.sh [interval_seconds]
set -u
cd "$(dirname "$0")/.."
INTERVAL="${1:-600}"
LOG=logs/recovery_loop.log
mkdir -p logs
echo "[recovery] start $(date -u +%FT%TZ) interval=${INTERVAL}s" >> "$LOG"
while true; do
  if timeout 150 python -c "
import subprocess, sys
r = subprocess.run([sys.executable, '-c',
    'import jax; jax.devices(); import jax.numpy as jnp; '
    'print(float((jnp.ones(8)*2).sum()))'],
    capture_output=True, text=True, timeout=145)
sys.exit(0 if r.returncode == 0 and '16.0' in r.stdout else 1)
" >> "$LOG" 2>&1; then
    echo "[recovery] backend responsive $(date -u +%FT%TZ) — measuring" >> "$LOG"
    python scripts/chip_measure.py >> "$LOG" 2>&1
    echo "[recovery] chip_measure done rc=$? $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "[recovery] still wedged $(date -u +%FT%TZ)" >> "$LOG"
  sleep "$INTERVAL"
done
