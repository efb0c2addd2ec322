package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Unigram-LM subword tokenizer (Kudo 2018, the SentencePiece unigram
  * algorithm — public) — the other production subword family next to
  * [[BpeOps]]: pieces carry probabilities, encoding is the Viterbi
  * max-likelihood segmentation, training is EM over the segmentation
  * lattice with iterative vocabulary pruning.
  *
  * Scale shape, same split as BPE (and as every production trainer):
  * the corpus-sized work is ONE distributed word-frequency groupBy;
  * seeding, EM and pruning then run on the word-frequency table, which
  * is vocabulary-sized, on the driver behind the same loud cap
  * (`BpeOps.defaultVocabCap`). Per-word lattices are tiny (|w| ·
  * maxPieceLen states), so EM cost is O(vocab words), not O(corpus).
  * Encoding is embarrassingly parallel per row.
  *
  * Simplifications vs the paper, chosen for determinism and
  * verifiability (documented, not hidden): seeds are all substrings up
  * to `seedMaxLen` ranked by freq·len (the paper's suffix-array top
  * substrings); pruning ranks pieces by their EM expected count
  * instead of the exact loss delta (the paper notes both are
  * monotone); single-character pieces are never pruned, so any word
  * over the seen alphabet always has a segmentation. UnigramSpec pins
  * the EM lattice against brute-force segmentation enumeration and
  * the pruning/coverage contracts; the q_unigram_tokens oracle replays
  * frozen-vocab Viterbi exactly in SQL. */
object UnigramOps {

  /** Corpus normalization — shared with BPE (and with both oracles):
    * lowercase, non-letters to spaces. */
  def words(text: Column): Column = BpeOps.words(text)

  /** Viterbi best segmentation of one normalized word under frozen
    * per-piece logprobs. DP over end positions; a candidate replaces
    * the incumbent only if strictly better, and piece lengths are
    * tried ascending, so exact ties resolve to the LONGEST piece
    * ending at that position — deterministic. Characters absent from
    * the vocabulary fall back to `unkLogp` single-char tokens. */
  private[graft] def viterbiWord(w: String, vocab: Map[String, Double],
                                 maxPiece: Int,
                                 unkLogp: Double): Array[String] = {
    val n = w.length
    if (n == 0) return Array.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1) // chosen piece length ending here
    best(0) = 0.0
    var end = 1
    while (end <= n) {
      var len = 1
      val maxLen = math.min(maxPiece, end)
      while (len <= maxLen) {
        val piece = w.substring(end - len, end)
        val lp = vocab.get(piece) match {
          case Some(p)            => p
          case None if len == 1   => unkLogp
          case None               => Double.NegativeInfinity
        }
        if (lp != Double.NegativeInfinity) {
          val cand = best(end - len) + lp
          if (cand >= best(end) && !(cand == best(end) &&
              len < back(end))) {
            best(end) = cand
            back(end) = len
          }
        }
        len += 1
      }
      end += 1
    }
    // reconstruct
    val out = mutable.ArrayBuffer.empty[String]
    var p = n
    while (p > 0) {
      val len = back(p)
      out += w.substring(p - len, p)
      p -= len
    }
    out.reverseIterator.toArray
  }

  /** Log-domain forward-backward expected piece counts for one word's
    * segmentation lattice: alpha(i) = log marginal of prefixes ending
    * at i, beta(i) = of suffixes starting at i; a piece (s,e) has
    * posterior exp(alpha(s) + lp + beta(e) - alpha(n)). Returns the
    * (expected counts, log marginal) pair. Brute-force-enumeration
    * parity is pinned in UnigramSpec. */
  private[graft] def expectedCounts(w: String,
      vocab: Map[String, Double], maxPiece: Int)
      : (Map[String, Double], Double) = {
    val n = w.length
    def lse(a: Double, b: Double): Double =
      if (a == Double.NegativeInfinity) b
      else if (b == Double.NegativeInfinity) a
      else { val m = math.max(a, b); m + math.log1p(math.exp(-(math.abs(a - b)))) }
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    for (end <- 1 to n; len <- 1 to math.min(maxPiece, end)) {
      vocab.get(w.substring(end - len, end)).foreach { lp =>
        alpha(end) = lse(alpha(end), alpha(end - len) + lp) }
    }
    beta(n) = 0.0
    for (start <- (n - 1) to 0 by -1;
         len <- 1 to math.min(maxPiece, n - start)) {
      vocab.get(w.substring(start, start + len)).foreach { lp =>
        beta(start) = lse(beta(start), lp + beta(start + len)) }
    }
    val z = alpha(n)
    if (z == Double.NegativeInfinity) return (Map.empty, z)
    val acc = mutable.HashMap.empty[String, Double]
    for (start <- 0 until n;
         len <- 1 to math.min(maxPiece, n - start)) {
      val piece = w.substring(start, start + len)
      vocab.get(piece).foreach { lp =>
        val post = math.exp(alpha(start) + lp + beta(start + len) - z)
        if (post > 0) acc(piece) = acc.getOrElse(piece, 0.0) + post
      }
    }
    (acc.toMap, z)
  }

  /** Train a unigram-LM vocabulary of (piece → logprob), target size
    * `targetVocab` (multi-char pieces + the full seen single-char
    * alphabet; the alphabet is never pruned, so the target is a floor
    * when the alphabet alone exceeds it). Distributed word count;
    * driver EM + pruning over the capped word-frequency table. */
  def trainUnigram(df: DataFrame, text: Column, targetVocab: Int,
                   seedMaxLen: Int = 4, seedFactor: Int = 4,
                   emIters: Int = 2, shrink: Double = 0.75,
                   vocabCap: Int = BpeOps.defaultVocabCap)
      : Map[String, Double] = {
    require(targetVocab > 0 && seedMaxLen >= 2 && shrink < 1.0,
      "trainUnigram: need targetVocab > 0, seedMaxLen >= 2, shrink < 1")
    val freqDf = df.select(explode(words(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    val rows = freqDf.take(vocabCap + 1)
    require(rows.length <= vocabCap,
      s"unigram: vocabulary exceeds cap $vocabCap — filter or " +
        "sample the corpus, or raise -Dgraft.maxBpeVocab")
    val wordFreq = rows.map(r => (r.getString(0), r.getLong(1)))

    // seed: every substring up to seedMaxLen, scored freq·len (the
    // suffix-array top-substring approximation); alphabet always in
    val subCount = mutable.HashMap.empty[String, Long]
    wordFreq.foreach { case (w, f) =>
      for (s <- 0 until w.length;
           e <- (s + 1) to math.min(w.length, s + seedMaxLen))
        subCount(w.substring(s, e)) =
          subCount.getOrElse(w.substring(s, e), 0L) + f
    }
    val alphabet = subCount.keysIterator.filter(_.length == 1).toSeq
    val seedKeep = subCount.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-(c * p.length), p) }
      .take(math.max(targetVocab * seedFactor, targetVocab) -
        alphabet.size)
      .map(_._1)
    var vocab: Map[String, Double] = {
      val seeds = (alphabet ++ seedKeep)
        .map(p => p -> subCount(p).toDouble * p.length)
      val tot = seeds.iterator.map(_._2).sum
      seeds.map { case (p, c) => p -> math.log(c / tot) }.toMap
    }

    // EM + prune rounds until at target size
    var done = false
    while (!done) {
      var it = 0
      while (it < emIters) {
        val acc = mutable.HashMap.empty[String, Double]
        wordFreq.foreach { case (w, f) =>
          val (cts, z) = expectedCounts(w, vocab, seedMaxLen)
          if (z != Double.NegativeInfinity)
            cts.foreach { case (p, c) =>
              acc(p) = acc.getOrElse(p, 0.0) + c * f }
        }
        // alphabet smoothing floor keeps coverage pieces alive even
        // when longer pieces absorb all their posterior mass
        alphabet.foreach(a => acc(a) = acc.getOrElse(a, 0.0) + 1e-6)
        val tot = acc.valuesIterator.sum
        vocab = vocab.keysIterator.flatMap { p =>
          acc.get(p).map(c => p -> math.log(c / tot)) }.toMap ++
          alphabet.map(a => a -> math.log(acc(a) / tot)).toMap
        it += 1
      }
      val multi = vocab.keysIterator.filter(_.length > 1).toSeq
      val targetMulti = math.max(0, targetVocab - alphabet.size)
      if (multi.size <= targetMulti) done = true
      else {
        val nextMulti =
          math.max(targetMulti, (multi.size * shrink).toInt)
        // prune by EM contribution (expected count ∝ exp(logp))
        val keep = multi.sortBy(p => (-vocab(p), p)).take(nextMulti)
          .toSet
        vocab = vocab.filter { case (p, _) =>
          p.length == 1 || keep(p) }
      }
    }
    vocab
  }

  /** Encode to Viterbi subword tokens under a frozen vocabulary:
    * normalize, segment each word, stream tokens out word by word
    * (same contract as [[BpeOps.bpeEncode]]). */
  def unigramEncode(text: Column, vocab: Map[String, Double],
                    unkLogp: Double = -100.0): Column = {
    val maxPiece =
      if (vocab.isEmpty) 1 else vocab.keysIterator.map(_.length).max
    val f = udf { (s: String) =>
      if (s == null) null
      else BpeOps.normalizeWords(s)
        .flatMap(w => viterbiWord(w, vocab, maxPiece, unkLogp)).toSeq
    }
    f(text)
  }

  /** Token count under the learned vocabulary. */
  def unigramTokenCount(text: Column, vocab: Map[String, Double]): Column =
    size(unigramEncode(text, vocab))
}
