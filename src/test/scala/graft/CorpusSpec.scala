package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.{CorpusOps, TextOps}

/** Corpus-preparation operators: duplicated-span detection/removal,
  * paragraph dedup, token-budget mixing, sequence packing. Goldens are
  * hand-computed; the bucketed mixing path is checked against a naive
  * single-window twin (the equivalence that makes it safe at scale);
  * packing is checked against an independent sequential fold. */
class CorpusSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def w(n: Int, tag: String = "w"): String =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("duplicatedSpans finds a cross-doc repeated passage and merges " +
    "overlapping k-grams into one maximal span") {
    import spark.implicits._
    // docs 1 and 2 share words s0..s9 (10 words) at different offsets;
    // k=4 grams inside it are duplicated, nothing else is
    val shared = w(10, "s")
    val df = Seq(
      (1L, w(5, "a") + " " + shared + " " + w(5, "b")),
      (2L, shared + " " + w(12, "c"))
    ).toDF("doc_id", "text")
    val spans = CorpusOps.duplicatedSpans(df, col("doc_id"), col("text"),
        k = 4).orderBy("doc_id").collect()
    assert(spans.length == 2)
    val s1 = spans(0)
    assert(s1.getAs[Long]("doc_id") == 1L)
    assert(s1.getAs[Int]("span_start") == 5 &&
      s1.getAs[Int]("span_end") == 14 && s1.getAs[Int]("span_len") == 10)
    val s2 = spans(1)
    assert(s2.getAs[Int]("span_start") == 0 &&
      s2.getAs[Int]("span_end") == 9 && s2.getAs[Int]("span_len") == 10)
  }

  test("duplicatedSpans counts within-document repeats (Lee et al. " +
    "semantics) and keeps disjoint spans separate") {
    import spark.implicits._
    val rep = w(4, "r")
    // "r0..r3 x0..x9 r0..r3": the 4-gram repeats inside ONE doc; the
    // two occurrences are > k apart so they stay two spans
    val df = Seq((7L, rep + " " + w(10, "x") + " " + rep))
      .toDF("doc_id", "text")
    val spans = CorpusOps.duplicatedSpans(df, col("doc_id"), col("text"),
        k = 4).orderBy("span_start").collect()
    assert(spans.map(r => (r.getAs[Int]("span_start"),
      r.getAs[Int]("span_end"))).toSeq == Seq((0, 3), (14, 17)))
  }

  test("removeDuplicatedSpans strips exactly the flagged words") {
    import spark.implicits._
    val shared = w(6, "s")
    val df = Seq(
      (1L, w(3, "a") + " " + shared),
      (2L, shared + " " + w(3, "b")),
      (3L, w(5, "u"))
    ).toDF("doc_id", "text")
    val out = CorpusOps.removeDuplicatedSpans(df, col("doc_id"),
        col("text"), k = 3).orderBy("doc_id")
      .select("cleaned_text").as[String].collect()
    assert(out(0) == w(3, "a"))
    assert(out(1) == w(3, "b"))
    assert(out(2) == w(5, "u"))
  }

  test("paragraphDedup keeps first occurrence corpus-wide and rebuilds " +
    "pages in paragraph order") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha\n\nbeta\n\ngamma"),
      (2L, "beta\n\ndelta"),
      (3L, "alpha\n\nbeta")
    ).toDF("page", "text")
    val out = CorpusOps.paragraphDedup(df, col("page"), col("text"))
      .orderBy("page").collect()
    assert(out(0).getAs[String]("rebuilt") == "alpha\n\nbeta\n\ngamma")
    assert(out(1).getAs[String]("rebuilt") == "delta" &&
      out(1).getAs[Long]("n_kept") == 1L &&
      out(1).getAs[Long]("n_paras") == 2L)
    // page 3 is entirely paragraphs seen on page 1 → nothing survives
    assert(out(2).isNullAt(out(2).fieldIndex("rebuilt")) &&
      out(2).getAs[Long]("n_kept") == 0L)
  }

  test("tokenBudgetMix bucketed cumsum equals the naive single-window " +
    "selection, and overshoot is at most one document") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = t001("documents")
    val budget = lit(300)
    val got = CorpusOps.tokenBudgetMix(docs, col("doc_id"), col("source"),
        col("text"), budget)
    // naive twin: one global per-domain window over the same hash order
    val naive = docs.select(col("doc_id"), col("source").as("domain"),
        TextOps.tokenCount(col("text")).cast("long").as("tok"),
        md5(concat(col("doc_id").cast("string"), lit(":s42"))).as("h"))
      .withColumn("cum", sum(col("tok")).over(
        Window.partitionBy("domain").orderBy(col("h"), col("doc_id"))))
      .filter(col("cum") - col("tok") < 300)
      .select("doc_id", "domain", "tok")
    val g = got.select("doc_id", "domain", "tok").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val n = naive.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(g == n && g.nonEmpty)
    // start-fit: tokens before the last selected doc stay under budget
    val over = got.groupBy("domain")
      .agg(max(col("cum_tok") - col("tok")).as("pre"))
      .filter(col("pre") >= 300).count()
    assert(over == 0)
  }

  test("packSequences matches an independent greedy fold and respects " +
    "the budget except for oversize singletons") {
    import spark.implicits._
    val docs = t001("documents")
    val b = 250L
    val out = CorpusOps.packSequences(docs, col("source"), col("doc_id"),
        TextOps.tokenCount(col("text")), b)
      .orderBy("grp", "ord").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent fold over the same ordered input
    val expect = out.map { case (g, o, t, _) => (g, o, t) }
      .groupBy(_._1).toSeq.flatMap { case (g, rows) =>
        var bin = 0L; var fill = Long.MaxValue
        rows.sortBy(_._2).map { case (_, o, t) =>
          if (fill > Long.MaxValue - t || fill + t > b) {
            bin += 1; fill = t
          } else fill += t
          ((g, o), bin)
        }
      }.toMap
    out.foreach { case (g, o, _, bin) => assert(expect((g, o)) == bin) }
    // invariants: bins within budget unless a single oversize doc
    val bins = out.groupBy(r => (r._1, r._4)).values
    bins.foreach { rows =>
      val tot = rows.map(_._3).sum
      assert(tot <= b || rows.length == 1)
    }
    // greedy tightness: consecutive bins couldn't have merged
    out.groupBy(_._1).values.foreach { rows =>
      val byBin = rows.groupBy(_._4).toSeq.sortBy(_._1)
      byBin.sliding(2).foreach {
        case Seq((_, a), (_, nb)) =>
          val firstNext = nb.minBy(_._2)._3
          assert(a.map(_._3).sum + firstNext > b)
        case _ =>
      }
    }
  }

  test("ngramLmScore matches a hand-computed add-alpha bigram model") {
    import spark.implicits._
    // corpus: "a b a b" + "a c" → unigrams a:3 b:2 c:1 (V=3),
    // bigrams: (a,b):2 (b,a):1 (a,c):1
    val train = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = graft.text.LmOps.ngramLmScore(train, col("text"),
        train, col("doc_id"), col("text"), n = 2, alpha = 0.5)
      .orderBy("doc_id").collect()
    val v = 3.0
    def p(cb: Long, cu: Long): Double = (cb + 0.5) / (cu + 0.5 * v)
    // doc 1 bigrams: ab ba ab
    val ce1 = -(math.log(p(2, 3)) + math.log(p(1, 2)) +
      math.log(p(2, 3))) / 3.0
    // doc 2 bigram: ac
    val ce2 = -math.log(p(1, 3))
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_ngrams") == 3L)
    assert(math.abs(out(0).getAs[Double]("cross_entropy") - ce1) < 1e-12)
    assert(math.abs(out(0).getAs[Double]("ppl") - math.exp(ce1)) < 1e-12)
    assert(out(1).getAs[Long]("n_ngrams") == 1L)
    assert(math.abs(out(1).getAs[Double]("cross_entropy") - ce2) < 1e-12)
  }

  test("ngramLmScore: unseen grams smooth to alpha/(alpha*V) and short " +
    "docs are absent") {
    import spark.implicits._
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((10L, "z q"), (11L, "a"), (12L, " "))
      .toDF("doc_id", "text")
    val out = graft.text.LmOps.ngramLmScore(train, col("text"),
        score, col("doc_id"), col("text"), n = 2, alpha = 0.4)
      .orderBy("doc_id").collect()
    // only doc 10 has a bigram; both its words are OOV → p = 0.4/(0.4*2)
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(10L))
    val ce = -math.log(0.4 / (0.4 * 2.0))
    assert(math.abs(out(0).getAs[Double]("cross_entropy") - ce) < 1e-12)
  }

  test("perplexityFilter keeps fluent (in-distribution) docs and drops " +
    "the gibberish tail") {
    import spark.implicits._
    val fluent = (1 to 8).map(i => (i.toLong, "the cat sat on the mat"))
    val noise = Seq((100L, "zxq qzk wvv pqr"), (101L, "mmm nnn ooo ppp"))
    val df = (fluent ++ noise).toDF("doc_id", "text")
    // self-trained: fluent bigrams occur 8x (ppl ≈ 1.7) while each
    // gibberish bigram occurs once (ppl ≈ 4.4) — cut between them
    val kept = graft.text.LmOps.perplexityFilter(df, col("text"),
        df, col("doc_id"), col("text"), maxPpl = 3.0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((1L to 8L).forall(kept.contains))
    assert(!kept.contains(100L) && !kept.contains(101L))
  }

  test("slidingChunks: window offsets, overlap, short tail, blanks") {
    import spark.implicits._
    val df = Seq((1L, w(10)), (2L, "one two three"), (3L, "   "),
      (4L, "solo")).toDF("id", "t")
    val out = CorpusOps.slidingChunks(df, col("id"), col("t"),
      chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getString(4)))
    // doc 1: 10 tokens → starts 0,3,6,9; last is a 1-token tail
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(_._3) sameElements Array(0, 3, 6, 9))
    assert(d1.map(_._4) sameElements Array(4, 4, 4, 1))
    assert(d1(0)._5 == "w0 w1 w2 w3")
    assert(d1(1)._5 == "w3 w4 w5 w6") // 1-token overlap at stride 3
    assert(d1(3)._5 == "w9")
    // doc 2: 3 tokens → one window, short
    val d2 = out.filter(_._1 == 2L)
    assert(d2.length == 1 && d2(0)._4 == 3)
    // blank doc → no rows; single token → one 1-token window
    assert(!out.exists(_._1 == 3L))
    assert(out.count(_._1 == 4L) == 1)
    // chunking is a map-only plan: no exchange anywhere
    val plan = CorpusOps.slidingChunks(df, col("id"), col("t"), 4, 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("sentences + sentenceDedup: segmentation contract and " +
    "first-occurrence survivorship") {
    import spark.implicits._
    val segs = Seq("One. Two two! Three three three? trailing fragment")
      .toDF("t").select(CorpusOps.sentences(col("t")).as("s"))
      .head.getSeq[String](0)
    assert(segs == Seq("One.", "Two two!", "Three three three?"))
    // dedup: page 1 seeds both sentences; pages 2/3 repeat them
    val pages = Seq(
      (1L, "Alpha beta. Gamma delta."),
      (2L, "Alpha beta. New sentence here."),
      (3L, "Gamma delta. Alpha beta.")).toDF("id", "t")
    val out = CorpusOps.sentenceDedup(pages, col("id"), col("t"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L) == ((2L, 2L, "Alpha beta. Gamma delta.")))
    assert(out(2L) == ((2L, 1L, "New sentence here.")))
    assert(out(3L)._2 == 0L && out(3L)._3 == null)
  }

  test("perplexityBuckets: buckets are ppl-ordered ranges per group; " +
    "approx path agrees with exact away from the cut boundary") {
    val docs = t001("documents")
    val b = graft.text.LmOps.perplexityBuckets(docs, col("text"), docs,
        col("doc_id"), col("text"), col("source"),
        lowCut = 0.25, highCut = 0.75, exact = true)
    // per group: max(head) <= min(middle) <= max(middle) <= min(tail)
    val rng = b.groupBy("grp").agg(
      max(when(col("bucket") === "head", col("ppl"))).as("h_max"),
      min(when(col("bucket") === "middle", col("ppl"))).as("m_min"),
      max(when(col("bucket") === "middle", col("ppl"))).as("m_max"),
      min(when(col("bucket") === "tail", col("ppl"))).as("t_min"))
      .collect()
    rng.foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2), r.toString)
      assert(r.getDouble(3) <= r.getDouble(4), r.toString)
    }
    // head holds ~25% of each group
    val frac = b.groupBy("grp").agg(
      (sum(when(col("bucket") === "head", 1).otherwise(0)) /
        count(lit(1))).as("f")).agg(avg("f")).head.getDouble(0)
    assert(math.abs(frac - 0.25) < 0.1, s"head fraction $frac")
    // approx path: same schema, same per-group totals, buckets still
    // ordered (cut VALUES may differ slightly, membership may move
    // near the boundary only)
    val a = graft.text.LmOps.perplexityBuckets(docs, col("text"), docs,
        col("doc_id"), col("text"), col("source"),
        lowCut = 0.25, highCut = 0.75)
    assert(a.columns.toSeq == Seq("doc_id", "grp", "ppl", "bucket"))
    assert(a.count() == b.count())
    val dis = a.select(col("doc_id"), col("bucket").as("ab"))
      .join(b.select(col("doc_id"), col("bucket").as("bb")), "doc_id")
      .filter(col("ab") =!= col("bb")).count()
    assert(dis <= b.count() / 5,
      s"approx vs exact disagreement too large: $dis")
  }

  test("snapshotDiff: added/removed/changed/unchanged, format-only " +
      "edits unchanged, null payloads null-safe") {
    import spark.implicits._
    import graft.text.CorpusOps
    val old = Seq(
      (1L, Some("alpha beta")),   // unchanged verbatim
      (2L, Some("Gamma  Delta")), // format-only edit in v2 → unchanged
      (3L, Some("epsilon")),      // real edit in v2 → changed
      (4L, Some("dropped")),      // absent from v2 → removed
      (5L, None: Option[String]), // null in both → unchanged
      (6L, None: Option[String])  // null → text in v2 → changed
    ).toDF("doc_id", "text")
    val nw = Seq(
      (1L, Some("alpha beta")),
      (2L, Some("  gamma delta ")), // case/whitespace only
      (3L, Some("epsilon prime")),
      (5L, None: Option[String]),
      (6L, Some("now present")),
      (7L, Some("brand new"))       // added
    ).toDF("doc_id", "text")
    val got = CorpusOps.snapshotDiff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged",
      3L -> "changed", 4L -> "removed", 5L -> "unchanged",
      6L -> "changed", 7L -> "added"))
  }

  private def t001(name: String) =
    spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
}
