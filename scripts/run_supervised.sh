#!/bin/bash
# Generic supervised runner for long TPU jobs: the axon tunnel can hang an
# RPC forever; kill on stale log and rerun (jobs must auto-resume from
# their checkpoints).
# usage: run_supervised.sh <logfile> <done-regex> <stale-secs> <cmd...>
LOG=$1; DONE_RE=$2; STALE=$3; shift 3
while true; do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "supervisor: pid $PID: $*" >> "$LOG"
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
  if tail -5 "$LOG" | grep -qE "$DONE_RE"; then
    echo "supervisor: done" >> "$LOG"
    break
  fi
  echo "supervisor: restarting" >> "$LOG"
  sleep 10
done
