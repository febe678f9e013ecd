#!/bin/bash
# Watchdog for the round-4 TPU measurement chain (same design as round
# 3's, with the rc-reporting fix in scripts/r4_lib.sh and EVERY terminal
# artifact gated — the round-3 chain declared itself complete with the
# fwi_grad stage dead, VERDICT r3 Weak #2).  Relaunches the chain
# sequentially whenever no batch script is alive and artifacts are
# missing.  Artifact-gated: safe to relaunch any number of times.
set -u
cd /root/repo
LOG=results/r4_batch.log
echo $$ > /tmp/r4_watchdog.pid

alive() { [ -f "$1" ] && kill -0 "$(cat "$1")" 2>/dev/null; }

CHAIN="r4_shard1 r4_fwigrad"
[ -f scripts/r4_salt.sh ] && CHAIN="$CHAIN r4_salt"
[ -f scripts/r4_rtm.sh ] && CHAIN="$CHAIN r4_rtm"
[ -f scripts/r4_perf.sh ] && CHAIN="$CHAIN r4_perf"

chain_alive() {
  for n in $CHAIN; do
    alive "/tmp/$n.pid" && return 0
  done
  return 1
}

# Terminal artifact(s) per batch script — every gated stage's LAST
# artifact must be present (not just one per script).
done_all() {
  [ -f results/r4_shard1_prod.json ] && \
  [ -f results/r4_shard1_skip.json ] && \
  [ -f results/r4_shard1_local.json ] && \
  [ -f results/r4_shard1_ppermute.json ] && \
  [ -f results/r4_merged_ref.json ] && \
  [ -f results/r4_fwi_grad_small.json ] && \
  [ -f results/r4_fwi_grad.json ] && \
  [ -f results/r4_fwi_grad_roll24.json ] && \
  [ -f results/r4_fwi_grad_p3.json ] || return 1
  # later batches gate only once their scripts exist
  if [ -f scripts/r4_salt.sh ]; then
    [ -f results/r4_fwi_salt3d.npz ] || return 1
  fi
  if [ -f scripts/r4_rtm.sh ]; then
    [ -f results/r4_rtm3d.json ] || return 1
    [ -f results/r4_rtm2d.json ] || return 1
  fi
  if [ -f scripts/r4_perf.sh ]; then
    [ -f results/r4_perf_done ] || return 1
  fi
  return 0
}

END=$(( $(date +%s) + 140000 ))   # bounded: give up after ~39 h
while [ "$(date +%s)" -lt "$END" ]; do
  if done_all; then
    echo "watchdog: chain complete $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  if ! chain_alive; then
    echo "=== watchdog (re)launch $(date -u +%FT%TZ) ===" >> "$LOG"
    # re-evaluate the chain list each pass: later batch scripts appear
    # as the round progresses
    CHAIN="r4_shard1 r4_fwigrad"
    [ -f scripts/r4_salt.sh ] && CHAIN="$CHAIN r4_salt"
    [ -f scripts/r4_rtm.sh ] && CHAIN="$CHAIN r4_rtm"
    [ -f scripts/r4_perf.sh ] && CHAIN="$CHAIN r4_perf"
    for n in $CHAIN; do
      bash "scripts/$n.sh"
    done
  fi
  sleep 300
done
echo "watchdog: timed out $(date -u +%FT%TZ)" >> "$LOG"
