#!/bin/bash
# Wait for the tunnelled chip to come back, then run the given command.
# Usage: run_when_up.sh <logfile> <cmd...>
LOG="$1"; shift
cd /root/repo
echo "[run_when_up] waiting for chip, started $(date -u +%FT%TZ)" >> "$LOG"
while true; do
  if timeout 150 python -c "
import sys; sys.path.insert(0,'/root/repo')
from bench import wait_for_chip
sys.exit(0 if wait_for_chip(max_wait_s=120) else 1)" >/dev/null 2>&1; then
    echo "[run_when_up] chip up at $(date -u +%FT%TZ), running: $*" >> "$LOG"
    "$@" >> "$LOG" 2>&1
    echo "[run_when_up] done rc=$? at $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "[run_when_up] still down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 180
done
