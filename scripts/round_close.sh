#!/bin/bash
# Serialized end-of-round verification pipeline (verify-skill order:
# gate -> test -> bench; nothing CPU-heavy overlaps the bench).
#
# Close-order contract (r11 verdict ask #2): the bench MUST measure the
# code it will be compared against. Enforced mechanically:
#   - step 0 fails the close if any operator-path file (src/main,
#     build.sbt) is uncommitted — the bench only measures committed code;
#   - the bench runs are stamped with the measured HEAD sha (Bench.scala
#     writes "head"/"code_dirty" into its detail JSON);
#   - step 4 fails the close if the stamped head is not the commit the
#     close finishes on, or if any operator-path commit postdates it.
# If a code commit lands AFTER a close, the next close (or
# scripts/bench_fresh_check.sh standalone) fails until re-benched.
#
# Variance protocol (r11 verdict ask #2b): the bench runs >= 3 fresh
# JVMs; BENCH_DETAIL.json records the per-query MEDIAN plus the
# [min,max] spread, so the regression tripwire can tell noise (wide
# spread band) from code (median shift beyond the band).
set -u
cd /root/repo
R="${GRAFT_ROUND:-r12}"
RUNS="${GRAFT_BENCH_RUNS:-3}"

echo "=== [0/5] close-order guard: operator paths must be committed ==="
DIRTY=$(git status --porcelain -- src/main build.sbt)
if [ -n "$DIRTY" ]; then
  echo "$DIRTY"
  echo "ROUND_CLOSE_FAILED (uncommitted operator-path changes -- the"
  echo "bench would measure code the baseline commit does not contain)"
  exit 1
fi
HEAD_SHA=$(git rev-parse HEAD)
echo "OK: clean at $HEAD_SHA"

echo "=== [1/5] full ScalaTest suite ==="
sbt -batch test > /tmp/sbt_test_${R}.log 2>&1
grep -E "Tests: |All tests" /tmp/sbt_test_${R}.log | tail -2
if ! grep -q "All tests passed" /tmp/sbt_test_${R}.log; then
  echo "ROUND_CLOSE_FAILED (scalatest)"
  exit 1
fi

echo "=== [2/5] full sf0.01 oracle gate ==="
python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_${R}final \
  > /tmp/gate_${R}final.log 2>&1
tail -2 /tmp/gate_${R}final.log
if ! tail -2 /tmp/gate_${R}final.log | grep -qE " 0 failed"; then
  echo "ROUND_CLOSE_FAILED (oracle gate)"
  exit 1
fi

echo "=== [3/5] fresh-JVM bench sf0.1 x${RUNS} (median -> BENCH_DETAIL) ==="
for i in $(seq 1 "$RUNS"); do
  # seed each run's detail path with the COMMITTED baseline so the
  # in-run >1.5x retry compares against the committed numbers, not the
  # previous run of this loop
  git show HEAD:BENCH_DETAIL.json > /tmp/bench_run_${R}_$i.json \
    2>/dev/null || rm -f /tmp/bench_run_${R}_$i.json
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    GRAFT_BENCH_DETAIL=/tmp/bench_run_${R}_$i.json \
    sbt -batch "runMain graft.Bench" \
    > /tmp/bench_${R}final_$i.log 2>&1
  grep '"metric"' /tmp/bench_${R}final_$i.log | head -c 200
  echo
done

python3 - "$R" "$RUNS" "$HEAD_SHA" <<'EOF'
import json, statistics, sys
r, runs, head = sys.argv[1], int(sys.argv[2]), sys.argv[3]
data = []
for i in range(1, runs + 1):
    with open(f"/tmp/bench_run_{r}_{i}.json") as f:
        data.append(json.load(f))
for d in data:
    if d.get("head") != head or d.get("code_dirty"):
        sys.exit(f"FAIL: a bench run measured head={d.get('head')} "
                 f"dirty={d.get('code_dirty')}, close head is {head}")
names = set()
for d in data:
    names |= set(d["queries"])
queries, spread = {}, {}
for q in sorted(names):
    vals = sorted(d["queries"][q] for d in data if q in d["queries"])
    queries[q] = round(statistics.median(vals), 3)
    spread[q] = [vals[0], vals[-1]]
total = round(sum(queries.values()), 3)
wide = {q: s for q, s in spread.items()
        if queries[q] > 0 and (s[1] - s[0]) / queries[q] > 0.5}
# carry the session-speed canary: median of the runs' BEST-of-3 probes
# becomes THE committed calibration value the next session's tripwire
# normalizes against (r12 ask #2); the canary's own per-run probe
# spread is recorded too so a noisy canary is visible in the baseline
# (r13 ask #3)
cals = [d["calibration"] for d in data if d.get("calibration", 0) > 0]
cal = round(statistics.median(cals), 3) if cals else 0.0
cal_probes = sorted(p for d in data
                    for p in d.get("calibration_probes", []))
cal_band = ([cal_probes[0], cal_probes[-1]] if cal_probes else [])
out = {"total": total, "n": len(queries), "sf": "/root/testdata/sf0.1",
       "head": head, "runs": runs, "calibration": cal,
       "calibration_band": cal_band,
       "queries": queries, "spread": spread}
with open("BENCH_DETAIL.json", "w") as f:
    json.dump(out, f, separators=(",", ":"))
print(f"median total {total}s over {runs} runs; "
      f"{len(wide)} queries with >50% spread band"
      + (f": {sorted(wide)[:8]}" if wide else ""))
EOF
if [ $? -ne 0 ]; then
  echo "ROUND_CLOSE_FAILED (bench merge)"
  exit 1
fi

echo "=== [4/5] bench-baseline completeness + freshness gate ==="
# Every SparkEntry.queries key MUST have a row in the regenerated
# BENCH_DETAIL.json vs the committed one -- otherwise a late-added query
# ships with no regression tripwire (the r9/r10 failure class) -- and
# the regenerated file must be stamped with THIS close's head.
python3 - "$HEAD_SHA" <<'EOF'
import json, subprocess, sys
head = sys.argv[1]
committed = subprocess.run(
    ["git", "show", "HEAD:BENCH_DETAIL.json"],
    capture_output=True, text=True)
if committed.returncode != 0:
    sys.exit("FAIL: no committed BENCH_DETAIL.json at HEAD")
baseline = set(json.loads(committed.stdout).get("queries", {}))
cur = json.load(open("BENCH_DETAIL.json"))
current = set(cur.get("queries", {}))
missing = sorted(current - baseline)
if missing:
    print("NOTE: %d new queries since the committed baseline: %s"
          % (len(missing), ", ".join(missing[:10])))
if cur.get("head") != head:
    sys.exit("FAIL: BENCH_DETAIL head %s != close head %s"
             % (cur.get("head"), head))
print("OK: %d bench queries, stamped at %s" % (len(current), head[:12]))
EOF
STATUS=$?
if [ $STATUS -ne 0 ]; then
  echo "ROUND_CLOSE_FAILED (baseline gate)"
  exit $STATUS
fi

echo "=== [5/5] post-close freshness check ==="
bash scripts/bench_fresh_check.sh || {
  echo "ROUND_CLOSE_FAILED (freshness)"
  exit 1
}
echo "ROUND_CLOSE_DONE -- commit BENCH_DETAIL.json NOW, before any"
echo "further operator-path commit (bench_fresh_check.sh enforces this)"
