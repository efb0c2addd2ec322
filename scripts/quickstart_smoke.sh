#!/bin/bash
# Adoption smoke test (r11 verdict ask #8): prove the packaged jar works
# in a BARE spark-shell session -- no sbt classpath, no repo test
# harness -- exactly the way a user of the README quickstart would load
# it. Runs three representative API surfaces: SQL functions through
# GraftExtensions, the Column DSL, and a full operator (MinHash dedup
# pairs + pipeline fit/transform round-trip).
#
# REPL note: every multi-line statement is wrapped in { } so the
# line-by-line interpreter sees one expression (a bare trailing
# .method() line would otherwise detach from its receiver).
set -u
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/polars_ds_extensionspark_2.13-0.1.0.jar
if [ ! -f "$JAR" ]; then
  echo "jar missing -- run: sbt package" >&2
  exit 1
fi
OUT=/tmp/quickstart_smoke.log
/opt/spark/bin/spark-shell \
  --master 'local[4]' \
  --jars "$JAR" \
  --conf spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions \
  --conf spark.ui.enabled=false \
  --conf spark.sql.shuffle.partitions=8 \
  --conf spark.sql.session.timeZone=UTC \
  > "$OUT" 2>&1 << 'EOF'
// 1. SQL surface via spark.sql.extensions (native codegen expressions)
{
  val r1 = spark.sql(
    "SELECT graft_fingerprint64('Hello   World') = graft_fingerprint64('hello world') AS same, " +
    "round(graft_jaro('martha', 'marhta'), 6) AS jaro").head
  assert(r1.getBoolean(0), "fingerprint should normalize whitespace+case")
  assert(math.abs(r1.getDouble(1) - 0.944444) < 1e-6, s"jaro ${r1.getDouble(1)}")
  println("SMOKE_1_OK sql extensions")
}

// 2. Column DSL: text quality features over a tiny frame
import org.apache.spark.sql.functions._
val docs = {
  import spark.implicits._
  Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),
    (3L, "completely different text with other words here")
  ).toDF("doc_id", "text")
}
{
  val q = docs
    .select(col("doc_id"),
      graft.text.TextOps.qualityFeatures(col("text")).as("f"))
    .select(col("doc_id"), col("f.n_tokens").as("n_tokens"),
      col("f.quality").as("quality"))
  assert(q.count() == 3 && q.filter(col("n_tokens") === 9).count() == 2)
  println("SMOKE_2_OK column dsl")
}

// 3. Full operators: MinHash dedup pairs + a fit/transform pipeline
{
  val pairs = graft.text.TextOps.minHashDupPairs(
    docs, col("doc_id"), col("text"), 0.8, 1, 64, 16).collect()
  assert(pairs.length == 1 && pairs(0).getLong(0) == 1L &&
    pairs(0).getLong(1) == 2L, pairs.mkString(","))
  val train = {
    import spark.implicits._
    Seq((1.0, "a"), (2.0, "b"), (3.0, "a"), (100.0, "b")).toDF("x", "g")
  }
  val pipe = graft.pipeline.Blueprint(train)
    .impute(Seq("x"), "median")
    .winsorize(Seq("x"), 0.0, 0.75)
    .materialize()
  val json = pipe.toJson
  val scored = graft.pipeline.Pipeline.fromJson(json).transform(train)
  assert(scored.agg(max(col("x"))).head.getDouble(0) < 100.0,
    "winsorize should clip the outlier after JSON round-trip")
  println("SMOKE_3_OK operators + pipeline json round-trip")
}
EOF
STATUS=$?
PASS=$(grep -c "SMOKE_._OK" "$OUT")
if [ "$STATUS" -ne 0 ] || [ "$PASS" -ne 3 ]; then
  echo "QUICKSTART SMOKE FAILED ($PASS/3 markers, exit $STATUS) -- see $OUT"
  grep -E "SMOKE|error:|Exception" "$OUT" | head -20
  exit 1
fi
echo "QUICKSTART SMOKE OK (3/3 API surfaces on the bare-session jar)"
