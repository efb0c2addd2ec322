package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the MakeSkew twin-fixture invariants the BASELINE.md skew
  * numbers depend on: equal row counts per table (volume identical,
  * ONLY key distribution differs), the hot-domain/hot-family/hot-key
  * fractions near their design targets, and the uniform twin's key
  * distribution untouched. A silent drift here would quietly turn the
  * skew/uniform ratio into a volume comparison. */
class MakeSkewSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private lazy val root: String = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_makeskew_spec"
    MakeSkew.run(spark, "/root/testdata/sf0.001", out, 2)
    out
  }
  private def tbl(twin: String, name: String) =
    spark.read.parquet(s"$root/$twin/$name.parquet")

  test("twins have identical row counts per table") {
    Seq("documents", "events", "lineitem", "orders", "customer",
        "embeddings").foreach { t =>
      assert(tbl("uniform", t).count() == tbl("skew", t).count(), t)
    }
    // factor 2 really replicated the volume tables
    assert(tbl("uniform", "documents").count() == 2 *
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .count())
  }

  test("skew twin hits its design fractions; uniform twin stays flat") {
    val docs = tbl("skew", "documents")
    val n = docs.count().toDouble
    val hot = docs.filter(col("source") === "src0").count() / n
    assert(hot > 0.2 && hot < 0.45, s"hot-domain share $hot")
    val fam = docs.filter(col("text").startsWith("boil1 ")).count() / n
    assert(fam > 0.003 && fam < 0.03, s"hot-family share $fam")
    // family members all live in the hot domain (one giant block)
    assert(docs.filter(col("text").startsWith("boil1 ") &&
      col("source") =!= "src0").count() == 0)
    // uniform twin: no source above 2x the flat share
    val u = tbl("uniform", "documents")
    val maxShare = u.groupBy("source").count()
      .agg(max("count")).head.getLong(0) / u.count().toDouble
    assert(maxShare < 0.10, s"uniform max source share $maxShare")

    val ev = tbl("skew", "events")
    val hu = ev.filter(col("user_id") === 0L).count() /
      ev.count().toDouble
    assert(hu > 0.2 && hu < 0.4, s"hot-user share $hu")

    val li = tbl("skew", "lineitem")
    val topKey = li.groupBy("l_orderkey").count()
      .agg(max("count")).head.getLong(0) / li.count().toDouble
    assert(topKey > 0.12 && topKey < 0.3, s"hot-order share $topKey")
    // and the hot key is URGENT (the bloom-join probe depends on it)
    val hotKey = li.groupBy("l_orderkey").count()
      .orderBy(col("count").desc).head.getLong(0)
    assert(tbl("skew", "orders")
      .filter(col("o_orderkey") === hotKey &&
        col("o_orderpriority") === "1-URGENT").count() == 1)
  }
}
