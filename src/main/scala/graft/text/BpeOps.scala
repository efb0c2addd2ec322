package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, public
  * algorithm) — upgrades the corpus token accounting from the
  * regex approximation in [[TextOps]] to a real learned subword
  * vocabulary.
  *
  * Scale shape, the same split every production BPE trainer uses:
  * word-frequency counting is DISTRIBUTED (one groupBy over the
  * corpus — the only part that sees 100 TB); merge learning then runs
  * on the word-frequency table, which is vocabulary-sized, on the
  * driver behind a loud cap (`vocabCap`). Encoding is embarrassingly
  * parallel per row.
  *
  * Merge application is defined as: for each learned merge, ONE
  * left-to-right non-overlapping pass over the word's symbol array
  * (the original BPE apply). With that semantics, encoding is exactly
  * reproducible by chained string REPLACEs over single-character
  * placeholder symbols — which is how the driver oracle checks it.
  */
object BpeOps {

  /** Corpus normalization shared by train and encode (and mirrored in
    * the oracle): lowercase, non-letters to spaces, split. */
  def words(text: Column): Column =
    split(regexp_replace(lower(text), "[^a-z]+", " "), " ")

  /** Row-side twin of [[words]], shared by the BPE and unigram encode
    * UDFs so the two tokenizers can never desynchronize. Locale.ROOT:
    * Spark's lower() is locale-independent; a tr_TR JVM default would
    * dotless-lowercase 'I' and diverge from training and the oracle. */
  private[text] def normalizeWords(s: String): Array[String] =
    s.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z]+", " ").split(" ").filter(_.nonEmpty)

  /** Default driver-side vocabulary cap. Past this, learn on a
    * sampled/filtered vocabulary — the merge loop is O(vocab·merges). */
  def defaultVocabCap: Int =
    sys.props.get("graft.maxBpeVocab").map(_.toInt).getOrElse(200000)

  /** Learn `numMerges` merges. Distributed word count; driver merge
    * loop over the (word, freq) table. Ties break to the
    * lexicographically smallest pair, so training is deterministic. */
  def trainBpe(df: DataFrame, text: Column, numMerges: Int,
               vocabCap: Int = defaultVocabCap): Seq[(String, String)] = {
    val freqDf = df.select(explode(words(text)).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    // ONE distributed job: take(cap+1) both enforces the cap and
    // fetches the vocabulary (at 100 TB the corpus groupBy dominates;
    // a separate count() would run the whole scan twice)
    val rows = freqDf.take(vocabCap + 1)
    require(rows.length <= vocabCap,
      s"bpe: vocabulary exceeds cap $vocabCap — filter or " +
        "sample the corpus, or raise -Dgraft.maxBpeVocab")
    val vocab = rows.map(r => (r.getString(0), r.getLong(1)))
    var seqs: Array[(Array[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = new ArrayBuffer[(String, String)]()
    var m = 0
    while (m < numMerges) {
      val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
      seqs.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) m = numMerges
      else {
        val best = counts.toSeq
          .minBy { case ((a, b), f) => (-f, a, b) }._1
        merges += best
        seqs = seqs.map { case (syms, f) =>
          (applyMerge(syms, best._1, best._2), f)
        }
        m += 1
      }
    }
    merges.toSeq
  }

  /** One left-to-right non-overlapping merge pass (the semantics the
    * oracle's REPLACE chain reproduces exactly). */
  private[graft] def applyMerge(syms: Array[String], a: String,
                                b: String): Array[String] = {
    val out = new ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  private[graft] def encodeWord(w: String,
                                merges: Seq[(String, String)]): Array[String] = {
    var syms = w.map(_.toString).toArray
    merges.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
    syms
  }

  /** Encode to subword tokens: normalize, then apply the merge list
    * per word; tokens stream out word by word. */
  def bpeEncode(text: Column, merges: Seq[(String, String)]): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else normalizeWords(s).flatMap(w => encodeWord(w, merges)).toSeq
    }
    f(text)
  }

  /** Token count under the learned vocabulary (the quantity a
    * token-budget data mix actually needs). */
  def bpeTokenCount(text: Column, merges: Seq[(String, String)]): Column =
    size(bpeEncode(text, merges))
}
