#!/bin/bash
# Resilient campaign launcher for the flaky remote-TPU service:
# probe -> run -> watchdog (restart the job if its log stops growing).
# The job must be resumable (per-SNR checkpoints) so restarts are cheap.
#
#   experiments/launch_campaign.sh LOGFILE CMD [ARGS...]
#
# Pair with run-in-background; tail LOGFILE for progress.
set -u
cd "$(dirname "$0")/.."
LOG=$1; shift
STALE_S=${STALE_S:-900}
for round in $(seq 1 12); do
  # wait until the service answers a trivial compile
  for i in $(seq 1 30); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda v: (v*2).sum())(jnp.arange(16.0))))" >/dev/null 2>&1; then
      echo "[launcher] tpu responsive (probe $i)" >> "$LOG"; break
    fi
    sleep 45
  done
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "[launcher] round $round pid=$PID: $*" >> "$LOG"
  while kill -0 $PID 2>/dev/null; do
    sleep 120
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ $AGE -gt $STALE_S ]; then
      echo "[launcher] log stale ${AGE}s; restarting" >> "$LOG"
      kill $PID; sleep 10; kill -9 $PID 2>/dev/null
      break
    fi
  done
  if wait $PID 2>/dev/null; then
    echo "[launcher] finished ok" >> "$LOG"; exit 0
  fi
  sleep 60
done
echo "[launcher] giving up after 12 rounds" >> "$LOG"
exit 1
