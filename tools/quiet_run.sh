#!/bin/bash
# Dev-only: wait for a measured-quiet window (steal + load1 pre-check),
# then exec the given command. Usage:
#   tools/quiet_run.sh <max_wait_sec> <cmd...>
# Pre-check: 30 s steal sample < 0.5% and load1 < 2.0; re-sampled until
# satisfied or max_wait elapses (then runs anyway, with a warning).
MAXW="$1"; shift
start=$(date +%s)
while true; do
  s0=$(awk '/^cpu /{print $9}' /proc/stat); t0=$(awk '/^cpu /{s=0; for(i=2;i<=NF;i++) s+=$i; print s}' /proc/stat)
  sleep 30
  s1=$(awk '/^cpu /{print $9}' /proc/stat); t1=$(awk '/^cpu /{s=0; for(i=2;i<=NF;i++) s+=$i; print s}' /proc/stat)
  steal=$(python3 -c "print(100.0*($s1-$s0)/max(1,$t1-$t0))")
  load=$(awk '{print $1}' /proc/loadavg)
  ok=$(python3 -c "print(1 if $steal < 0.5 and $load < 2.0 else 0)")
  now=$(date +%s)
  echo "[quiet_run] steal=${steal}% load1=${load} ok=${ok} waited=$((now-start))s" >&2
  if [ "$ok" = "1" ]; then break; fi
  if [ $((now - start)) -ge "$MAXW" ]; then
    echo "[quiet_run] WARNING: window never went quiet; running anyway" >&2
    break
  fi
done
exec "$@"
