#!/bin/bash
# Spool-driven TPU measurement runner: executes tools/queue_spool/*.sh in
# lexical order, one at a time, moving each to queue_spool/done/ (or
# failed/) afterward. New work can be added/reordered at any time by
# dropping/renaming files — no editing of a running script. Each spool
# file is run with bash; it should set its own timeout via the TMO=secs
# first line convention (default 3600).
# Single chip — run at most one instance. Appends to $LOG.
set -u
LOG=${LOG:-/tmp/tpu_spool.log}
SPOOL="$(cd "$(dirname "$0")" && pwd)/queue_spool"
cd "$(dirname "$0")/.."
mkdir -p "$SPOOL/done" "$SPOOL/failed"

log() { echo "[$(date +%H:%M:%S)] $*" >> "$LOG"; }

log "=== tpu_spool start (pid $$) ==="
# single-instance lock (pgrep-by-pattern is a footgun: launcher shells
# keep the pattern text in their argv and match forever)
LOCK="$SPOOL/.runner.pid"
if [ -f "$LOCK" ] && kill -0 "$(cat "$LOCK")" 2>/dev/null; then
  log "another runner (pid $(cat "$LOCK")) is live; exiting"
  exit 1
fi
echo $$ > "$LOCK"

idle=0
while :; do
  next=$(ls "$SPOOL"/*.sh 2>/dev/null | head -1)
  if [ -z "$next" ]; then
    idle=$((idle + 1))
    [ $idle -ge 240 ] && { log "idle 2h, exiting"; exit 0; }
    sleep 30
    continue
  fi
  idle=0
  name=$(basename "$next")
  tmo=$(sed -n 's/^# *TMO=\([0-9]*\).*/\1/p' "$next" | head -1)
  tmo=${tmo:-3600}
  log "--- $name (timeout ${tmo}s) ---"
  timeout "$tmo" bash "$next" >> "$LOG" 2>&1
  rc=$?
  log "--- $name done (rc=$rc) ---"
  if [ $rc -eq 0 ]; then mv "$next" "$SPOOL/done/$name"
  else mv "$next" "$SPOOL/failed/$name"; fi
done
