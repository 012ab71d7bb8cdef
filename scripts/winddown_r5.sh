#!/bin/bash
# Round-5 end-of-session wind-down (run ~35 min before the driver bench).
# Same contract as winddown_r4.sh: reap every recorded worker tree so the
# driver's bench capture gets an idle TPU and an idle core, then stage
# experiment artifacts for the final commit.
set -u
cd /root/repo || exit 1

note() { echo "$(date -u '+%F %T') $*"; }

reap() {
  local pidfile=$1
  [ -f "$pidfile" ] || return 0
  local pid
  pid=$(cat "$pidfile")
  local all="$pid"
  for p in $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    all="$all $p"
    for q in $(ps -o pid= --ppid "$p" 2>/dev/null); do all="$all $q"; done
  done
  for p in $all; do kill "$p" 2>/dev/null && note "TERM $p (from $pidfile)"; done
}

PIDFILES="/tmp/queue_r5d.pid /tmp/r5_clusters.pid /tmp/noise_r5.pid"

for f in $PIDFILES; do reap "$f"; done
sleep 10
for f in $PIDFILES; do
  [ -f "$f" ] || continue
  pid=$(cat "$f")
  for p in $pid $(ps -o pid= --ppid "$pid" 2>/dev/null); do
    kill -9 "$p" 2>/dev/null && note "KILL $p"
  done
  rm -f "$f"
done

for pid in $(ps -eo pid= -o args= | awk '/r5_cpu_clusters|full_hilbert_space|kagome_train|sampled_connected_components|analysis noise/ && !/awk/ {print $1}'); do
  note "WARNING: survivor pid $pid still alive after reap"
done

note "staging artifacts"
git add -A experiments/ figures_out/ 2>/dev/null
git status --short | head -20
note "wind-down done; review and commit"
