package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.UnigramOps

class UnigramSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def ln(p: Double) = math.log(p)

  /** All segmentations of w into vocab pieces, with their
    * probability products — the exponential-time ground truth the
    * forward-backward lattice must reproduce. */
  private def enumerate(w: String, vocab: Map[String, Double])
      : Seq[(Seq[String], Double)] = {
    if (w.isEmpty) return Seq((Nil, 1.0))
    (1 to w.length).flatMap { len =>
      val piece = w.substring(0, len)
      vocab.get(piece).toSeq.flatMap { lp =>
        enumerate(w.substring(len), vocab).map { case (rest, pr) =>
          (piece +: rest, math.exp(lp) * pr)
        }
      }
    }
  }

  test("forward-backward expected counts == brute-force enumeration") {
    val vocab = Map("a" -> ln(0.3), "b" -> ln(0.2), "ab" -> ln(0.4),
      "ba" -> ln(0.1))
    for (w <- Seq("ab", "abab", "aabba", "bbb", "ababab")) {
      val segs = enumerate(w, vocab)
      val z = segs.map(_._2).sum
      val expCounts = segs
        .flatMap { case (toks, pr) => toks.map(t => (t, pr / z)) }
        .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).sum }
      val (got, gotZ) = UnigramOps.expectedCounts(w, vocab, 2)
      assert(math.abs(gotZ - math.log(z)) < 1e-12, s"$w logZ")
      assert(got.keySet == expCounts.keySet, s"$w pieces")
      got.foreach { case (p, c) =>
        assert(math.abs(c - expCounts(p)) < 1e-10, s"$w piece $p") }
    }
    // unreachable word (char not in vocab): -inf marginal, no counts
    val (none, zNone) = UnigramOps.expectedCounts("axb", vocab, 2)
    assert(none.isEmpty && zNone == Double.NegativeInfinity)
  }

  test("viterbi: best path, longest-piece tie-break, unk fallback") {
    val vocab = Map("t" -> ln(0.01), "h" -> ln(0.01), "e" -> ln(0.01),
      "th" -> ln(0.2), "r" -> ln(0.01))
    assert(UnigramOps.viterbiWord("the", vocab, 2, -100.0).toSeq ==
      Seq("th", "e"))
    // exact tie: p(ab) == p(a)p(b) — the longer piece must win
    val tie = Map("a" -> ln(0.1), "b" -> ln(0.1), "ab" -> ln(0.01))
    assert(UnigramOps.viterbiWord("ab", tie, 2, -100.0).toSeq ==
      Seq("ab"))
    // unk char: single-char fallback token, neighbors still optimal
    assert(UnigramOps.viterbiWord("thx", vocab, 2, -100.0).toSeq ==
      Seq("th", "x"))
    // concatenation is lossless
    for (w <- Seq("therethe", "ttt", "hr"))
      assert(UnigramOps.viterbiWord(w, vocab, 2, -100.0).mkString == w)
  }

  test("training: dominant piece survives pruning, alphabet coverage, " +
      "normalized probs, target size") {
    import spark.implicits._
    val docs = (Seq.fill(50)("abab abba abab") ++ Seq.fill(5)("cdcd"))
      .toDF("t")
    val vocab = UnigramOps.trainUnigram(docs, col("t"),
      targetVocab = 8, seedMaxLen = 3)
    // every seen char present (coverage contract)
    for (c <- Seq("a", "b", "c", "d"))
      assert(vocab.contains(c), s"alphabet $c")
    // the corpus-dominant piece survives with more mass than the rare
    // one's pieces
    assert(vocab.contains("ab"), vocab.keySet.toString)
    val multi = vocab.keys.filter(_.length > 1)
    assert(vocab.size <= 8 && multi.nonEmpty)
    assert(vocab("ab") > vocab.getOrElse("cd", Double.NegativeInfinity))
    // M-step normalization: probabilities sum to 1
    val tot = vocab.valuesIterator.map(math.exp).sum
    assert(math.abs(tot - 1.0) < 1e-9, s"sum=$tot")
    // encoding under the learned vocab uses the dominant piece
    val toks = UnigramOps.viterbiWord("abab", vocab,
      vocab.keysIterator.map(_.length).max, -100.0)
    assert(toks.count(_ == "ab") == 2, toks.toSeq.toString)
  }

  test("property: Viterbi attains the enumerated-segmentation optimum " +
      "and the lattice marginal matches, over random vocabs/words") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val chars = Seq("a", "b", "c")
    val pieceGen = for {
      len <- Gen.choose(2, 3)
      cs <- Gen.listOfN(len, Gen.oneOf(chars))
    } yield cs.mkString
    var cases = 0
    for (seed <- 1L to 120L) {
      // random vocab: full alphabet + 0-4 random pieces, random probs
      val nPieces = sample(Gen.choose(0, 4), seed)
      val pieces = (0 until nPieces)
        .map(i => sample(pieceGen, seed * 131 + i)).distinct
      val vocab = (chars ++ pieces).distinct.map { p =>
        p -> math.log(sample(Gen.choose(0.01, 0.5), seed ^ p.hashCode))
      }.toMap
      val w = sample(Gen.listOfN(sample(Gen.choose(1, 9), seed + 7),
        Gen.oneOf(chars)), seed * 17).mkString
      val segs = enumerate(w, vocab)
      assert(segs.nonEmpty) // singles cover everything
      val bestEnum = segs.map { case (_, pr) => math.log(pr) }.max
      val got = UnigramOps.viterbiWord(w, vocab, 3, -1e9)
      assert(got.mkString == w, s"seed $seed lossless")
      val gotLp = got.map(vocab).sum
      assert(math.abs(gotLp - bestEnum) < 1e-9,
        s"seed $seed word $w vocab $vocab: viterbi $gotLp enum $bestEnum")
      val (_, z) = UnigramOps.expectedCounts(w, vocab, 3)
      assert(math.abs(z - math.log(segs.map(_._2).sum)) < 1e-9,
        s"seed $seed marginal")
      cases += 1
    }
    assert(cases == 120)
  }

  test("unigramEncode distributes and matches the local kernel") {
    import spark.implicits._
    val vocab = Map("t" -> ln(0.01), "h" -> ln(0.01), "e" -> ln(0.01),
      "q" -> ln(0.01), "u" -> ln(0.01), "i" -> ln(0.01),
      "c" -> ln(0.01), "k" -> ln(0.01), "th" -> ln(0.2),
      "qu" -> ln(0.2))
    val df = Seq("The quick", "THE the", "", "  ",
      "queue?! thee").toDF("t")
    val got = df.select(UnigramOps.unigramEncode(col("t"), vocab)
      .as("toks")).collect().map(_.getSeq[String](0))
    val want = Seq("The quick", "THE the", "", "  ", "queue?! thee")
      .map(_.toLowerCase.replaceAll("[^a-z]+", " ").split(" ")
        .filter(_.nonEmpty)
        .flatMap(w => UnigramOps.viterbiWord(w, vocab, 2, -100.0)).toSeq)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    // token count column agrees
    val n = df.select(UnigramOps.unigramTokenCount(col("t"), vocab)
      .as("n")).collect().map(_.getInt(0)).sum
    assert(n == want.map(_.size).sum)
  }
}
