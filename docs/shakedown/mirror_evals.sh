#!/bin/bash
# Eval-artifact auto-mirror (VERDICT r3 "Next #8"): copy each completed
# fid_*.log from the scratch dir into the tracked evals dir and commit it,
# so curve artifacts never depend on a live builder session.
#
# Runs as a detached poller because editing run_phases_r3b.sh while bash is
# mid-execution is unsafe (bash reads scripts incrementally). Idempotent:
# a log is committed only when it is complete (has the final FID line) and
# differs from the tracked copy. Usage:
#   nohup bash docs/shakedown/mirror_evals.sh /root/shk3 \
#       docs/shakedown/r3b_evals > /tmp/mirror.log 2>&1 &
# Exits on its own when the watchdog pidfile (arg 3, default /tmp/wd.pid)
# names a dead process AND one final sweep found nothing new.
set -u
SRC=${1:-/root/shk3}
DST=${2:-docs/shakedown/r3b_evals}
WDPID=${3:-/tmp/wd.pid}
cd "$(dirname "$0")/../.."
mkdir -p "$DST"

sweep() {
  local changed=0
  for f in "$SRC"/fid_*.log; do
    [ -e "$f" ] || continue
    grep -aq '^FID' "$f" || continue          # only completed evals
    local b=$(basename "$f")
    cmp -s "$f" "$DST/$b" 2>/dev/null || cp -f "$f" "$DST/$b"
    # git state, not file identity, decides whether to commit: the
    # recipe's own cp leaves an identical-but-untracked file behind
    if [ -n "$(git status --porcelain -- "$DST/$b")" ]; then
      git add "$DST/$b"
      changed=1
    fi
  done
  # Path-limited commit so a builder session's concurrently-staged files
  # are never swept into this commit.
  if [ "$changed" = 1 ]; then
    git commit -q -m "shakedown: mirror completed eval logs ($(ls "$DST" | grep -c fid_) points)" -- "$DST" || true
  fi
}

while true; do
  sweep
  if ! kill -0 "$(cat "$WDPID" 2>/dev/null)" 2>/dev/null; then
    sweep   # final pass after the watchdog exits
    exit 0
  fi
  sleep 120
done
