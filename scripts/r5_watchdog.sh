#!/bin/bash
# Watchdog for the round-5 TPU measurement chain.  Design change from
# r4 (closes ADVICE r4 medium): instead of a hardcoded artifact list,
# every batch script scripts/r5_<name>.sh touches results/r5_<name>_done
# as its LAST line; done_all simply requires the marker for every
# existing r5 batch script.  Stages inside the scripts remain
# individually artifact-gated on non-empty files, so relaunching a
# partially-complete script re-runs only what is missing.  Safe to
# relaunch any number of times.
set -u
cd /root/repo
LOG=results/r5_batch.log
echo $$ > /tmp/r5_watchdog.pid

alive() { [ -f "$1" ] && kill -0 "$(cat "$1")" 2>/dev/null; }

batches() {  # ordered list of existing batch names (not the watchdog)
  for f in scripts/r5_*.sh; do
    n=$(basename "$f" .sh)
    [ "$n" = r5_watchdog ] && continue
    echo "$n"
  done
}

chain_alive() {
  for n in $(batches); do
    alive "/tmp/$n.pid" && return 0
  done
  return 1
}

done_all() {
  for n in $(batches); do
    [ -f "results/${n}_done" ] || return 1
  done
  return 0
}

END=$(( $(date +%s) + 50000 ))   # bounded: ~14 h
while [ "$(date +%s)" -lt "$END" ]; do
  if done_all; then
    echo "r5 watchdog: chain complete $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  if ! chain_alive; then
    echo "=== r5 watchdog (re)launch $(date -u +%FT%TZ) ===" >> "$LOG"
    for n in $(batches); do
      [ -f "results/${n}_done" ] || bash "scripts/$n.sh"
    done
  fi
  sleep 300
done
echo "r5 watchdog: timed out $(date -u +%FT%TZ)" >> "$LOG"
