#!/bin/bash
# Supervised sweep runner: the axon TPU tunnel occasionally hangs an RPC
# forever (observed: axon-conn-read blocked in tcp_recvmsg).  Restart the
# sweep whenever its log goes stale; it resumes from the latest stacked
# checkpoint (algo/sweep.py auto-resume).
CFG=${1:-configs/sweep_r2.yml}
LOG=${2:-runs/sweep_r2/nohup.log}
STALE=${3:-420}
while true; do
  python -m q1physrl_tpu.algo.sweep "$CFG" >> "$LOG" 2>&1 &
  PID=$!
  echo "supervisor: sweep pid $PID" >> "$LOG"
  while kill -0 $PID 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALE" ]; then
      echo "supervisor: log stale ${AGE}s, killing $PID" >> "$LOG"
      kill -9 $PID 2>/dev/null
      sleep 5
      break
    fi
  done
  wait $PID 2>/dev/null
  if tail -5 "$LOG" | grep -q "Sweep done"; then
    echo "supervisor: sweep complete" >> "$LOG"
    break
  fi
  echo "supervisor: restarting" >> "$LOG"
  sleep 10
done
