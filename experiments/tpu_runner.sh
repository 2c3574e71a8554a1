#!/bin/bash
# Health-gated watchdog runner for TPU campaigns (CLAUDE.md ops pattern).
#
#   experiments/tpu_runner.sh JOBS_FILE [LOG_DIR]
#
# JOBS_FILE: one job per line, "logname<TAB-or-spaces>command ...".
# Blank lines and #-comments skipped. Each job:
#   - waits for the strong probe (experiments/tpu_probe.py, 240 s cap)
#     to pass — tiny probes lie during partial tunnel degradation;
#   - runs the command with stdout+stderr to LOG_DIR/logname.log;
#   - a watchdog kills the EXACT PID (never pattern kills) if the log
#     goes stale >$WATCHDOG_S (default 900 s — first-compile tolerance);
#   - retries up to 8 times (per-point checkpoints make retries cheap).
#
# Keep ONE runner instance: concurrent TPU clients stall each other's
# compiles, and a killed-mid-compile client can wedge the service.
set -u
cd "$(dirname "$0")/.."
JOBS_FILE=${1:?usage: tpu_runner.sh JOBS_FILE [LOG_DIR]}
LOG_DIR=${2:-/tmp/tpu_runner_logs}
WATCHDOG_S=${WATCHDOG_S:-900}
mkdir -p "$LOG_DIR"
RLOG="$LOG_DIR/runner.log"

probe() {
  while true; do
    timeout 240 python experiments/tpu_probe.py >> "$LOG_DIR/probe.log" 2>&1
    [ $? -eq 0 ] && { echo "$(date +%T) probe OK" >> "$RLOG"; return 0; }
    echo "$(date +%T) probe FAILED, waiting 120s" >> "$RLOG"
    sleep 120
  done
}

run() {
  local log="$LOG_DIR/$1.log"; shift
  for attempt in 1 2 3 4 5 6 7 8; do
    probe
    echo "$(date +%T) start ($attempt): $*" >> "$RLOG"
    "$@" > "$log" 2>&1 &
    local pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      if [ "$age" -gt "$WATCHDOG_S" ]; then
        echo "WATCHDOG: $log stale ${age}s, kill $pid (attempt $attempt)" >> "$RLOG"
        kill "$pid"; sleep 5; kill -9 "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid" 2>/dev/null
    local rc=$?
    local age=$(( $(date +%s) - $(stat -c %Y "$log") ))
    if [ "$age" -le "$WATCHDOG_S" ] && [ "$rc" -eq 0 ]; then
      echo "$(date +%T) done: $log" >> "$RLOG"; return 0
    fi
    echo "$(date +%T) job failed rc=$rc age=${age}s: $log" >> "$RLOG"
  done
  echo "$(date +%T) GAVE UP: $log" >> "$RLOG"; return 1
}

while IFS= read -r line || [ -n "$line" ]; do
  case "$line" in ''|'#'*) continue;; esac
  name=$(echo "$line" | awk '{print $1}')
  cmd=$(echo "$line" | sed "s/^[^ \t]*[ \t]*//")
  run "$name" bash -c "$cmd"
done < "$JOBS_FILE"
echo "CHAIN_DONE" >> "$RLOG"
