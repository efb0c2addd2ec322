#!/bin/bash
# Standalone bench-freshness tripwire (r11 verdict ask #2): FAILS if any
# operator-path commit (src/main, build.sbt) postdates the commit the
# working-tree BENCH_DETAIL.json was measured on, i.e. the baseline no
# longer describes the code. Run it before declaring a round closed;
# round_close.sh runs it as its final step.
set -u
cd "$(dirname "$0")/.."
STAMP=$(python3 -c "import json;print(json.load(open('BENCH_DETAIL.json')).get('head',''))" 2>/dev/null)
if [ -z "$STAMP" ]; then
  echo "FRESHNESS FAIL: BENCH_DETAIL.json has no head stamp -- re-run" \
       "scripts/round_close.sh (pre-r12 baselines are unstamped)"
  exit 1
fi
if ! git cat-file -e "$STAMP" 2>/dev/null; then
  echo "FRESHNESS FAIL: stamped head $STAMP is not a commit here"
  exit 1
fi
LATE=$(git log --format='%h %s' "$STAMP"..HEAD -- src/main build.sbt)
if [ -n "$LATE" ]; then
  echo "FRESHNESS FAIL: operator-path commits postdate the bench stamp:"
  echo "$LATE"
  echo "-> re-run scripts/round_close.sh (or at least its bench step)"
  exit 1
fi
DIRTY=$(git status --porcelain -- src/main build.sbt)
if [ -n "$DIRTY" ]; then
  echo "FRESHNESS WARN: uncommitted operator-path changes exist;"
  echo "the committed baseline will not describe them once committed:"
  echo "$DIRTY"
fi
echo "FRESHNESS OK: no operator-path commit since bench stamp ${STAMP:0:12}"
