// Lives under org.apache.spark.sql so it can use the private[sql]
// expression/codegen APIs (AbstractDataType, ExpressionUtils) — the
// standard packaging for third-party native Catalyst expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions
  * as SQL functions (enable with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`, or call
  * [[GraftExtensions.install]] on an existing session builder).
  *
  * SURVEY §4.2 concluded no custom logical operators/rules are needed —
  * the extension surface is exactly function registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_hamming(str, str) takes exactly two arguments")
        HammingDistance(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint64"),
      new ExpressionInfo(classOf[Fingerprint64].getName,
        "graft_fingerprint64"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_fingerprint64(str) takes exactly one argument")
        Fingerprint64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_simhash64(str) takes exactly one argument")
        SimHash64(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash128"),
      new ExpressionInfo(classOf[SimHash128].getName, "graft_simhash128"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_simhash128(str) takes exactly one argument")
        SimHash128(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_word_ngram_hashes"),
      new ExpressionInfo(classOf[WordNgramHashes].getName,
        "graft_word_ngram_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_word_ngram_hashes(str, n) takes exactly two arguments")
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "graft_word_ngram_hashes: n must be an integer literal")
        }
        WordNgramHashes(children.head, n)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_token_hashes"),
      new ExpressionInfo(classOf[SortedTokenHashes].getName,
        "graft_sorted_token_hashes"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_sorted_token_hashes(str, shingleK) takes two arguments")
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            "graft_sorted_token_hashes: shingleK must be an integer literal")
        }
        SortedTokenHashes(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName,
        "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_minhash_sig(str, shingleK, numHashes) takes three " +
            "arguments")
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"graft_minhash_sig: $name must be an integer literal")
        }
        MinHashSig(children.head, intLit(children(1), "shingleK"),
          intLit(children(2), "numHashes"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedLongIntersectSize].getName,
        "graft_sorted_intersect_size"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_sorted_intersect_size(array<long>, array<long>) takes " +
            "exactly two arguments")
        SortedLongIntersectSize(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md_bucket_counts"),
      new ExpressionInfo(classOf[MdBucketCounts].getName,
        "graft_md_bucket_counts"),
      (children: Seq[Expression]) => {
        require(children.length == 3,
          "graft_md_bucket_counts(str, dim, hexChars) takes three arguments")
        def intLit(e: Expression, name: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Int, _) => v
          case _ => throw new IllegalArgumentException(
            s"graft_md_bucket_counts: $name must be an integer literal")
        }
        MdBucketCounts(children.head, intLit(children(1), "dim"),
          intLit(children(2), "hexChars"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName,
        "graft_deflate_ratio"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_deflate_ratio(str) takes exactly one argument")
        DeflateRatio(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro"),
      new ExpressionInfo(classOf[JaroSimilarity].getName, "graft_jaro"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_jaro(str, str) takes exactly two arguments")
        JaroSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName,
        "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2 || children.length == 3,
          "graft_jaro_winkler(str, str[, weight]) takes 2 or 3 arguments")
        val w = if (children.length == 2) 0.1 else children(2) match {
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: Double, _) => v
          case org.apache.spark.sql.catalyst.expressions
            .Literal(v: java.math.BigDecimal, _) => v.doubleValue()
          case _ => throw new IllegalArgumentException(
            "graft_jaro_winkler: weight must be a double literal")
        }
        JaroWinklerSimilarity(children.head, children(1), w)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_osa"),
      new ExpressionInfo(classOf[OsaDistance].getName, "graft_osa"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_osa(str, str) takes exactly two arguments")
        OsaDistance(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dleven"),
      new ExpressionInfo(classOf[DamerauDistance].getName, "graft_dleven"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_dleven(str, str) takes exactly two arguments")
        DamerauDistance(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_nfc(str) takes exactly one argument")
        NfcNormalize(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine_sim"),
      new ExpressionInfo(classOf[ArrayCosineSim].getName,
        "graft_cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_cosine_sim(array<double>, array<double>) takes " +
            "exactly two arguments")
        ArrayCosineSim(children.head, children(1))
      }))
  }
}

/** Column-DSL access to the native expressions (no session extension
  * required). */
object NativeFunctions {
  import org.apache.spark.sql.classic.ExpressionUtils

  def hammingNative(a: Column, b: Column): Column =
    ExpressionUtils.column(HammingDistance(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def fingerprint64Native(c: Column): Column =
    ExpressionUtils.column(Fingerprint64(ExpressionUtils.expression(c)))

  def simHash64Native(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))

  /** 128-bit SimHash as array<bigint> [w0, w1]; element 0 equals
    * [[simHash64Native]]'s output. */
  def simHash128Native(c: Column): Column =
    ExpressionUtils.column(SimHash128(ExpressionUtils.expression(c)))

  def wordNgramHashesNative(c: Column, n: Int): Column =
    ExpressionUtils.column(
      WordNgramHashes(ExpressionUtils.expression(c), n))

  /** Sorted distinct XXH64 token/shingle hashes — the exact-Jaccard
    * dedup tokenizer kernel. */
  def sortedTokenHashesNative(c: Column, shingleK: Int = 1): Column =
    ExpressionUtils.column(
      SortedTokenHashes(ExpressionUtils.expression(c), shingleK))

  /** MinHash signature (array<long>, `numHashes` slots over `k`-word
    * shingles) — the MinHash-LSH signing kernel. */
  def minHashSigNative(c: Column, shingleK: Int = 3,
                       numHashes: Int = 128): Column =
    ExpressionUtils.column(
      MinHashSig(ExpressionUtils.expression(c), shingleK, numHashes))

  /** Intersection size of two ascending-sorted distinct array<long>
    * columns — the SSJoin prefix path's exact-Jaccard verify kernel. */
  def sortedIntersectSizeNative(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersectSize(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def nfcNormalizeNative(c: Column): Column =
    ExpressionUtils.column(NfcNormalize(ExpressionUtils.expression(c)))

  def jaroNative(a: Column, b: Column): Column =
    ExpressionUtils.column(JaroSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def jaroWinklerNative(a: Column, b: Column,
                        weight: Double = 0.1): Column =
    ExpressionUtils.column(JaroWinklerSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      weight))

  def osaNative(a: Column, b: Column): Column =
    ExpressionUtils.column(OsaDistance(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def damerauNative(a: Column, b: Column): Column =
    ExpressionUtils.column(DamerauDistance(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Char-n-gram set similarity; kind ∈ NgramSetSimilarity.{Jaccard,
    * Dice, Overlap, Tversky}; alpha/beta only read for Tversky. */
  def ngramSimNative(a: Column, b: Column, n: Int, kind: Int,
                     alpha: Double = 0.0, beta: Double = 0.0): Column =
    ExpressionUtils.column(NgramSetSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      n, kind, alpha, beta))

  def lcsLenNative(a: Column, b: Column, subsequence: Boolean): Column =
    ExpressionUtils.column(LcsLength(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b),
      subsequence))

  def fuzzRatioNative(a: Column, b: Column): Column =
    ExpressionUtils.column(FuzzRatio(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Deflate-compressed bytes / raw UTF-8 bytes (empty → null) — the
    * compression-ratio repetition/quality signal. */
  def deflateRatioNative(c: Column): Column =
    ExpressionUtils.column(DeflateRatio(ExpressionUtils.expression(c)))

  /** Packed (bucket << 32 | cnt) hashed uni+bigram counts, buckets
    * ascending — the DSIR featurization kernel. */
  def mdBucketCountsNative(c: Column, dim: Int, hexChars: Int): Column =
    ExpressionUtils.column(
      MdBucketCounts(ExpressionUtils.expression(c), dim, hexChars))

  /** Distinct matched pattern indices (ascending) via one
    * Aho–Corasick pass. */
  def blocklistMatchesNative(c: Column, patterns: Seq[String]): Column =
    ExpressionUtils.column(
      BlocklistMatches(ExpressionUtils.expression(c), patterns))

  /** Cosine similarity of two array<double> columns — the ANN verify
    * kernel, arithmetic-identical to the zip_with/aggregate form. */
  def cosineSimNative(a: Column, b: Column): Column =
    ExpressionUtils.column(ArrayCosineSim(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
