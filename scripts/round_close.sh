#!/bin/bash
# Serialized end-of-round verification pipeline (verify-skill order:
# gate -> test -> bench; nothing CPU-heavy overlaps the bench).
set -u
cd /root/repo
R="${GRAFT_ROUND:-r11}"
echo "=== [1/4] full ScalaTest suite ==="
sbt -batch test > /tmp/sbt_test_${R}.log 2>&1
grep -E "Tests: |All tests" /tmp/sbt_test_${R}.log | tail -2
echo "=== [2/4] full sf0.01 oracle gate ==="
python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_${R}final \
  > /tmp/gate_${R}final.log 2>&1
tail -2 /tmp/gate_${R}final.log
echo "=== [3/4] fresh-JVM bench sf0.1 (regenerates BENCH_DETAIL) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_${R}final.log 2>&1
grep '"metric"' /tmp/bench_${R}final.log | head -c 400
echo
echo "=== [4/4] bench-baseline completeness gate ==="
# Every SparkEntry.queries key MUST have a row in the COMMITTED
# BENCH_DETAIL.json — otherwise a late-added query ships with no
# regression tripwire (the r9/r10 failure class).
python3 - <<'EOF'
import json, subprocess, sys
committed = subprocess.run(
    ["git", "show", "HEAD:BENCH_DETAIL.json"],
    capture_output=True, text=True)
if committed.returncode != 0:
    sys.exit("FAIL: no committed BENCH_DETAIL.json at HEAD")
baseline = set(json.loads(committed.stdout).get("queries", {}))
current = set(json.load(open("BENCH_DETAIL.json")).get("queries", {}))
missing = sorted(current - baseline)
if missing:
    sys.exit("FAIL: %d queries lack a committed bench baseline: %s\n"
             "-> commit the regenerated BENCH_DETAIL.json"
             % (len(missing), ", ".join(missing)))
print("OK: all %d bench queries have a committed baseline" % len(current))
EOF
STATUS=$?
if [ $STATUS -ne 0 ]; then
  echo "ROUND_CLOSE_FAILED (baseline gate)"
  exit $STATUS
fi
echo ROUND_CLOSE_DONE
