#!/bin/bash
# Serialized end-of-round verification pipeline (verify-skill order:
# gate -> test -> bench; nothing CPU-heavy overlaps the bench).
set -u
cd /root/repo
echo "=== [1/3] full ScalaTest suite ==="
sbt -batch test > /tmp/sbt_test_r10.log 2>&1
grep -E "Tests: |All tests" /tmp/sbt_test_r10.log | tail -2
echo "=== [2/3] full sf0.01 oracle gate ==="
python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_r10final \
  > /tmp/gate_r10final.log 2>&1
tail -2 /tmp/gate_r10final.log
echo "=== [3/3] fresh-JVM bench sf0.1 (regenerates BENCH_DETAIL) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > /tmp/bench_r10final.log 2>&1
grep '"metric"' /tmp/bench_r10final.log | head -c 400
echo
echo ROUND_CLOSE_DONE
