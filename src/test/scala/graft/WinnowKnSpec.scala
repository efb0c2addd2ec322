package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{LmOps, WinnowOps}

class WinnowKnSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("Kneser-Ney bigram: hand-computed probabilities and the " +
    "sum-to-one property") {
    import spark.implicits._
    // corpus "a b a c": cb = {ab:1, ba:1, ac:1}; c(a.)=2 N1+(a,.)=2;
    // c(b.)=1 N1+(b,.)=1; ncont b=1 a=1 c=1; nbig=3, d=0.75
    // p(b|a) = 0.25/2 + 0.75*(2/2)*(1/3) = 0.375
    // p(a|b) = 0.25/1 + 0.75*(1/1)*(1/3) = 0.5
    // p(a|a) = 0 + 0.75*(2/2)*(1/3) = 0.25  (unseen bigram, seen both)
    val train = Seq("a b a c").toDF("t")
    def ce(doc: String): Double =
      LmOps.ngramLmScoreKN(train, col("t"),
          Seq((1L, doc)).toDF("id", "t"), col("id"), col("t"))
        .head.getDouble(2)
    assert(math.abs(ce("a b") - (-math.log(0.375))) < 1e-12)
    assert(math.abs(ce("b a") - (-math.log(0.5))) < 1e-12)
    assert(math.abs(ce("a a") - (-math.log(0.25))) < 1e-12)
    // sum-to-one over the full vocab for prefix "a"
    val sum = math.exp(-ce("a a")) + math.exp(-ce("a b")) +
      math.exp(-ce("a c"))
    assert(math.abs(sum - 1.0) < 1e-12, s"sum $sum")
  }

  test("winnowing: the w+k-1 guarantee, density, and short docs") {
    import spark.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta" // 7 = w+k-1
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"seven eight $run nine ten eleven twelve"),
      (3L, "unrelated words entirely different here now okay fine"),
      (4L, "too short")).toDF("id", "t")
    val fps = WinnowOps.fingerprints(docs, col("id"), col("t"),
      k = 4, w = 4)
    // any shared run of >= w+k-1 words shares >= 1 fingerprint hash
    val pairs = WinnowOps.sharedFingerprintPairs(fps, minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"guarantee violated: $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // docs with < k+w-1 words have no full window
    assert(fps.filter(col("doc_id") === 4L).count() == 0L)
    // density ~ 2/(w+1) of grams on a longer doc
    val long = Seq((9L, (1 to 400).map(i => s"w${i % 97}x$i")
      .mkString(" "))).toDF("id", "t")
    val nf = WinnowOps.fingerprints(long, col("id"), col("t"), 4, 4)
      .count().toDouble
    val ng = 400 - 4 + 1
    assert(nf / ng > 0.2 && nf / ng < 0.6,
      s"density ${nf / ng} out of the ~2/(w+1)=0.4 band")
  }

  test("CDXJ parse + SURT key: fields, malformed routing, edge urls") {
    import spark.implicits._
    import graft.sources.CdxOps
    val good = "com,example)/p/7 20260101000000 " +
      "{\"url\": \"https://www.example.com/p/7\", \"mime\": " +
      "\"text/html\", \"status\": \"200\", \"digest\": \"D7\", " +
      "\"length\": \"512\", \"offset\": \"7000\", " +
      "\"filename\": \"crawl-0.warc.gz\"}"
    val bad = "com,example)/x 20260101000001 {not json at all"
    val out = Seq(good, bad).toDF("line")
      .select(CdxOps.parseCdxj(col("line")).as("r")).collect()
    val g = out(0).getStruct(0)
    assert(g.getAs[String]("urlkey") == "com,example)/p/7")
    assert(g.getAs[String]("timestamp") == "20260101000000")
    assert(g.getAs[String]("url") == "https://www.example.com/p/7")
    assert(g.getAs[Int]("status") == 200)
    assert(g.getAs[Long]("length") == 512L)
    assert(g.getAs[Long]("offset") == 7000L)
    assert(g.getAs[String]("filename") == "crawl-0.warc.gz")
    val b = out(1).getStruct(0)
    assert(b.getAs[String]("urlkey") == "com,example)/x")
    assert(b.isNullAt(b.fieldIndex("url"))) // malformed json → nulls
    // surt: www stripped, host reversed, case folded, root path kept
    val surt = Seq(
      "https://WWW.Sub.Example.COM/A/b",
      "http://example.org/",
      "https://example.org").toDF("u")
      .select(CdxOps.surtKey(col("u"))).collect().map(_.getString(0))
    assert(surt(0) == "com,example,sub)/A/b")
    assert(surt(1) == "org,example)/")
    assert(surt(2) == "org,example)")
  }

  test("Bradley-Terry MM: strength order tracks win rates, local and " +
    "distributed paths agree, degenerate players fail loud") {
    import spark.implicits._
    import graft.ops.PreferenceOps
    // balanced schedule, biased outcomes: deterministic pseudo-random
    // winner with p(i beats j) increasing in j - i
    val matches = (for {
      i <- 0 until 6; j <- 0 until 6 if i != j
      g <- 0 until 20
    } yield {
      val h = ((i * 31 + j * 17 + g * 7) % 10)
      // stronger (higher-index) player wins 7/10 cross matchups
      if (h < 7) { if (i > j) (i.toLong, j.toLong) else (j.toLong, i.toLong) }
      else { if (i > j) (j.toLong, i.toLong) else (i.toLong, j.toLong) }
    }).toDF("w", "l")
    val fit = PreferenceOps.bradleyTerry(matches, col("w"), col("l"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3))).toMap
    // mean-1 normalization; games = full schedule
    assert(math.abs(fit.values.map(_._1).sum / 6 - 1.0) < 1e-9)
    assert(fit.values.forall(_._3 == 2 * 5 * 20))
    // strengths increase with index (win rate does by construction)
    val ss = (0 until 6).map(i => fit(i.toLong)._1)
    assert(ss.zip(ss.tail).forall { case (a, b) => a < b }, ss.toString)
    // distributed loop (cap forced to 0) matches the driver path
    System.setProperty("graft.maxLocalBt", "0")
    try {
      val dist = PreferenceOps.bradleyTerry(matches, col("w"),
          col("l"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      (0 until 6).foreach(i => assert(
        math.abs(dist(i.toLong) - fit(i.toLong)._1) < 1e-9,
        s"player $i: ${dist(i.toLong)} vs ${fit(i.toLong)._1}"))
    } finally System.clearProperty("graft.maxLocalBt")
    // a player with no loss must fail loud
    val bad = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("w", "l")
    val e = intercept[IllegalArgumentException] {
      PreferenceOps.bradleyTerry(bad, col("w"), col("l"))
    }
    assert(e.getMessage.contains("no win or no loss"))
  }
}
