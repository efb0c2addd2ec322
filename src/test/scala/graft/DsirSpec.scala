package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.DsirOps

class DsirSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("uniBigrams: tokens + adjacent pairs, lowercased, edge cases") {
    import spark.implicits._
    val g = Seq("The quick  Fox", "solo", " ", "a b c")
      .toDF("t").select(DsirOps.uniBigrams(col("t")).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(g(0) == Seq("the", "quick", "fox", "the quick", "quick fox"))
    assert(g(1) == Seq("solo"))
    assert(g(2) == Seq())
    assert(g(3) == Seq("a", "b", "c", "a b", "b c"))
  }

  test("native ngramBuckets is row-identical to the Column-algebra " +
      "twin across tokenization edge cases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick  Fox jumps over the LAZY dog the quick"),
      (2L, "solo"),
      (3L, " "),
      (4L, ""),
      (5L, "\tTab\nlead mixedws"),
      (6L, "répé müller ünïcode répé"),
      (7L, "a a a a a b b b"),
      (8L, (1 to 200).map(i => s"w${i % 17}").mkString(" ")))
      .toDF("id", "t")
    for ((dim, hex) <- Seq((64, 2), (16, 1), (1000, 3))) {
      val native = DsirOps.ngramBuckets(docs, col("id"), col("t"),
          dim, hex)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      val columnar = DsirOps.ngramBucketsColumnar(docs, col("id"),
          col("t"), dim, hex)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .toSet
      assert(native == columnar,
        s"dim=$dim hex=$hex:\n only-native=${native -- columnar}\n " +
          s"only-columnar=${columnar -- native}")
    }
  }

  test("fitLogRatio: identical sides give zero ratios; over-represented" +
    " grams push scores toward the target") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("id", "t")
    val m0 = DsirOps.fitLogRatio(docs, docs, col("id"), col("t"),
      dim = 32, hexChars = 2)
    assert(m0.count() == 32L)
    val mx = m0.agg(max(abs(col("log_ratio")))).head.getDouble(0)
    assert(mx < 1e-12, s"identical corpora must give ~0 ratios, got $mx")
    // target contains only the "alpha"-style doc → doc 1 outscores doc 2
    val tgt = docs.filter(col("id") === 1L)
    val m1 = DsirOps.fitLogRatio(docs, tgt, col("id"), col("t"),
      dim = 32, hexChars = 2)
    val sc = DsirOps.score(docs, col("id"), col("t"), m1, 32, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sc(1L) > sc(2L) + 0.5,
      s"target-like doc must outscore: $sc")
  }

  test("resample: deterministic, k-bounded, prefers target-like docs") {
    import spark.implicits._
    // 100 docs: even ids look like the target ("data model train"),
    // odd ids are noise drawn from a disjoint vocabulary
    val docs = (0 until 100).map { i =>
      if (i % 2 == 0) (i.toLong, s"data model train data model v$i")
      else (i.toLong, s"noise junk filler random w$i")
    }.toDF("id", "t")
    val tgt = docs.filter(col("id") % 2 === 0)
    val sel = DsirOps.resample(docs, tgt, col("id"), col("t"),
      k = 30, dim = 64, hexChars = 2)
    val ids = sel.select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 30)
    val evens = ids.count(_ % 2 == 0)
    assert(evens >= 25, s"expected mostly target-like docs, got $evens/30")
    // same seed → identical selection; different seed → different noise
    val again = DsirOps.resample(docs, tgt, col("id"), col("t"),
      k = 30, dim = 64, hexChars = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == ids)
    // scoring joins the model by broadcast — corpus side never shuffles
    val model = DsirOps.fitLogRatio(docs, tgt, col("id"), col("t"),
      64, 2)
    val plan = DsirOps.score(docs, col("id"), col("t"), model, 64, 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("gumbelNoise: hash-derived standard Gumbel (mean ~ 0.5772)") {
    val g = spark.range(20000)
      .select(DsirOps.gumbelNoise(col("id"), 42).as("g"))
      .agg(avg("g"), stddev("g")).head
    assert(math.abs(g.getDouble(0) - 0.5772) < 0.03, g.toString)
    // stddev of Gumbel = pi/sqrt(6) ~ 1.2825
    assert(math.abs(g.getDouble(1) - 1.2825) < 0.05, g.toString)
  }
}
