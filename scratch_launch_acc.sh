#!/bin/bash
# Resilient campaign launcher for the flaky remote-TPU service:
# probe -> run -> watchdog (restart if the log stops growing).
cd /root/repo
LOG=/tmp/acc.log
for round in $(seq 1 12); do
  # wait until the service answers a trivial compile
  for i in $(seq 1 30); do
    if timeout 90 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda v: (v*2).sum())(jnp.arange(16.0))))" >/dev/null 2>&1; then
      echo "[launcher] tpu responsive (probe $i)" >> $LOG; break
    fi
    sleep 45
  done
  python experiments/accuracy_bc3.py --frames 131072 --epochs 24 >> $LOG 2>&1 &
  PID=$!
  echo "[launcher] campaign round $round pid=$PID" >> $LOG
  while kill -0 $PID 2>/dev/null; do
    sleep 120
    AGE=$(( $(date +%s) - $(stat -c %Y $LOG) ))
    if [ $AGE -gt 600 ]; then
      echo "[launcher] log stale ${AGE}s; restarting" >> $LOG
      kill $PID; sleep 10; kill -9 $PID 2>/dev/null
      break
    fi
  done
  if ! kill -0 $PID 2>/dev/null && wait $PID 2>/dev/null; then
    echo "[launcher] campaign finished ok" >> $LOG; exit 0
  fi
  sleep 60
done
echo "[launcher] giving up after 12 rounds" >> $LOG
