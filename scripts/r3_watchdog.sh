#!/bin/bash
# Watchdog for the round-3 TPU measurement chain.  Each batch script's
# wait_tpu gives up after 500 polls (~20 h at the observed ~2.4 min/poll
# cadence through the axon tunnel); if the TPU outage outlasts a script,
# its stages would be silently lost even though every stage is
# artifact-gated.  This loop relaunches the whole chain (sequentially,
# in one process, so nothing fights over the chip) whenever no batch
# script is alive and terminal artifacts are still missing.  Safe to
# run alongside the live chain: it only acts when the chain is dead.
set -u
cd /root/repo
LOG=results/r3_batch.log
echo $$ > /tmp/r3_watchdog.pid

alive() { [ -f "$1" ] && kill -0 "$(cat "$1")" 2>/dev/null; }

chain_alive() {
  for f in /tmp/r3_resume.pid /tmp/r3_new_paths.pid \
           /tmp/r3_round_off.pid /tmp/r3_overlap.pid /tmp/r3_p5.pid; do
    alive "$f" && return 0
  done
  return 1
}

# One terminal artifact per batch script (the last gated stage of each).
done_all() {
  [ -f results/fwi_salt3d_merged.npz ] && \
  [ -f results/r3_iso_lane_u_refresh.json ] && \
  [ -f results/rtm2d_lane.json ] && \
  [ -f results/r3_overlap_off.json ] && \
  [ -f results/r3_p5_lane.json ]
}

END=$(( $(date +%s) + 140000 ))   # bounded: give up after ~39 h
while [ "$(date +%s)" -lt "$END" ]; do
  if done_all; then
    echo "watchdog: chain complete $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  if ! chain_alive; then
    echo "=== watchdog relaunch $(date -u +%FT%TZ) ===" >> "$LOG"
    bash scripts/r3_resume_batch.sh
    bash scripts/r3_new_paths.sh
    bash scripts/r3_round_off.sh
    bash scripts/r3_overlap.sh
    bash scripts/r3_p5.sh
  fi
  sleep 300
done
echo "watchdog: timed out $(date -u +%FT%TZ)" >> "$LOG"
