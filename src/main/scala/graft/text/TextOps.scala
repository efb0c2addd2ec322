package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All the
  * scoring ops are pure `Column` algebra (codegen'd, no UDF) so they run
  * at full scan speed over 100 TB of documents; only the 64-bit
  * fingerprint is a UDF (cheap FNV-1a pass per doc).
  */
object TextOps {

  /** Stopword profiles for the n-gram language heuristic. Intentionally
    * tiny — the point is the *mechanism* (profile scoring as relational
    * algebra); swap in real profiles for production. */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to "),
    "es" -> Seq(" el ", " la ", " de ", " que ", " los "),
    "de" -> Seq(" der ", " die ", " und ", " ist ", " das "),
    "fr" -> Seq(" le ", " la ", " et ", " les ", " des "))

  private def countOcc(c: Column, pat: String): Column =
    (length(c) - length(regexp_replace(c, pat, ""))).cast("double") /
      math.max(pat.length, 1)

  /** Per-language stopword score: occurrences of profile words per 100
    * chars. Returns a struct of scores + argmax prediction; "zh" wins if
    * any CJK codepoints are present. */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> words.map(w => countOcc(padded, w)).reduce(_ + _)
    }
    val hasCjk = length(regexp_replace(text, "[^\\x{4e00}-\\x{9fff}]", ""))
      .cast("double")
    // argmax with deterministic tie-break by language code order
    val ordered = scores.toSeq.sortBy(_._1)
    val best = ordered.tail.foldLeft(
      struct(ordered.head._2.as("s"), lit(ordered.head._1).as("l"))) {
      case (acc, (lang, sc)) =>
        when(sc > acc.getField("s"),
          struct(sc.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(hasCjk > 0, lit("zh")).otherwise(best.getField("l"))
  }

  /** Whitespace token count. (pure algebra) */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish token estimate: alpha runs, digit runs and punctuation each
    * count; long words count ~len/4 subtokens (the published ~4 chars per
    * subword rule of thumb). */
  def tokenCountBpe(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    aggregate(words, lit(0L), (acc, w) =>
      acc + greatest(ceil(length(w).cast("double") / 4.0).cast("long"),
        lit(1L)))
  }

  /** Quality heuristics: chars, tokens, mean word length, punctuation
    * ratio, digit ratio, stopword ratio, plus a composite [0,1] score —
    * the standard pretraining-filter features, all codegen algebra. */
  def qualityFeatures(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val meanWordLen = (nChars - nTokens + 1.0) / nTokens
    val punct = length(regexp_replace(text, "[^.,;:!?]", ""))
      .cast("double") / nChars
    val digits = length(regexp_replace(text, "[^0-9]", ""))
      .cast("double") / nChars
    val stop = langProfiles("en").map(w =>
      countOcc(concat(lit(" "), lower(text), lit(" ")), w))
      .reduce(_ + _) / nTokens
    val score =
      when(nTokens < 5, 0.0).otherwise(
        least(lit(1.0),
          greatest(lit(0.0),
            lit(1.0)
              - abs(meanWordLen - 5.0) / 10.0
              - punct * 2.0
              - digits * 2.0)))
    struct(nChars.cast("long").as("n_chars"),
      nTokens.cast("long").as("n_tokens"),
      meanWordLen.as("mean_word_len"),
      punct.as("punct_ratio"),
      digits.as("digit_ratio"),
      stop.as("stopword_ratio"),
      score.as("quality"))
  }

  /** 64-bit FNV-1a fingerprint of whitespace-normalized lowercase text.
    * Deterministic across engines/runs; collision odds at 10⁹ docs
    * ≈ 2.7e-2 (birthday) — use 128-bit pairing for exactness at that
    * scale. */
  val fingerprint64 = udf { (s: String) =>
    if (s == null) null
    else {
      val t = s.toLowerCase.trim.replaceAll("\\s+", " ")
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < t.length) {
        h ^= t.charAt(i).toLong
        h *= 0x100000001b3L
        i += 1
      }
      java.lang.Long.valueOf(h)
    }
  }

  /** Exact dedup: keep the first doc (min of `keep`) per normalized-text
    * fingerprint. One shuffle on the fingerprint — the hash-groupBy
    * pattern that scales linearly. */
  def exactDedup(df: DataFrame, text: Column, keep: Column): DataFrame = {
    val fp = fingerprint64(text)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(fp)
      .orderBy(keep)
    df.withColumn("__pds_rn", row_number().over(w))
      .filter(col("__pds_rn") === 1).drop("__pds_rn")
  }

  /** Distinct-word-set Jaccard near-duplicate PAIRS within a blocking
    * key: explode distinct words → self-join on (block, word) → count
    * common words per pair → filter jaccard ≥ threshold.
    * Fully relational — this is the shape that scales (the join is on
    * (block, word), so common-word skew is bounded by block size), and
    * it is exactly reproducible in SQL for the oracle. */
  def jaccardDupPairs(df: DataFrame, id: Column, text: Column,
                      block: Column, threshold: Double): DataFrame = {
    val base = df.select(block.as("b"), id.as("i"),
      array_distinct(split(lower(trim(text)), "\\s+")).as("ws"))
      .withColumn("nw", size(col("ws")))
    val words = base.select(col("b"), col("i"), col("nw"),
      explode(col("ws")).as("w"))
    val l = words.as("l")
    val r = words.as("r")
    l.join(r, col("l.b") === col("r.b") && col("l.w") === col("r.w") &&
        col("l.i") < col("r.i"))
      .groupBy(col("l.b").as("block"), col("l.i").as("id1"),
        col("r.i").as("id2"), col("l.nw").as("n1"), col("r.nw").as("n2"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common") /
        (col("n1") + col("n2") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("block"), col("id1"), col("id2"), col("jaccard"))
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Deterministic 64-bit string hash (splitmix-style avalanche of
    * FNV-1a), salted by seed. */
  private def saltedHash(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ (seed * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    // finalize (splitmix64)
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  /** MinHash signature over `k`-word shingles, `numHashes` permutations.
    * Returns array<long>. (the shingle→minhash step of MinHash-LSH) */
  def minHashSignature(text: Column, k: Int = 3, numHashes: Int = 128)
      : Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val words = s.toLowerCase.trim.split("\\s+")
        val shingles: Seq[String] =
          if (words.length <= k) Seq(words.mkString(" "))
          else (0 to words.length - k).map(i =>
            words.slice(i, i + k).mkString(" "))
        val sig = Array.fill(numHashes)(Long.MaxValue)
        shingles.foreach { sh =>
          var i = 0
          while (i < numHashes) {
            val h = saltedHash(sh, i.toLong)
            if (h < sig(i)) sig(i) = h
            i += 1
          }
        }
        sig
      }
    }
    f(text)
  }

  /** LSH banding: signature → array of (bandIndex, bandHash) structs;
    * explode + groupBy bucket to find candidates. bands·rows must equal
    * the signature length. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column = {
    val f = udf { (s: Seq[Long]) =>
      if (s == null) null
      else (0 until bands).map { b =>
        var h = 0xcbf29ce484222325L
        var i = b * rows
        while (i < (b + 1) * rows) {
          h ^= s(i); h *= 0x100000001b3L; i += 1
        }
        (b, h)
      }
    }
    f(sig)
  }

  /** MinHash-LSH near-duplicate candidate pairs: sign → band → bucket
    * self-join → estimated jaccard from signature agreement ≥ threshold.
    * Scales as Σ bucket² instead of n². */
  def minHashDupPairs(df: DataFrame, id: Column, text: Column,
                      threshold: Double, k: Int = 3, numHashes: Int = 128,
                      bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val withSig = df.select(id.as("i"),
      minHashSignature(text, k, numHashes).as("sig"))
    val buckets = withSig
      .select(col("i"), col("sig"),
        explode(lshBands(col("sig"), bands, rows)).as("band"))
      .select(col("i"), col("sig"),
        col("band._1").as("b"), col("band._2").as("h"))
    val l = buckets.as("l")
    val r = buckets.as("r")
    val simUdf = udf { (a: Seq[Long], b: Seq[Long]) =>
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    }
    l.join(r, col("l.b") === col("r.b") && col("l.h") === col("r.h") &&
        col("l.i") < col("r.i"))
      .select(col("l.i").as("id1"), col("r.i").as("id2"),
        col("l.sig").as("s1"), col("r.sig").as("s2"))
      .distinct()
      .withColumn("est_jaccard", simUdf(col("s1"), col("s2")))
      .filter(col("est_jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("est_jaccard"))
  }

  /** 64-bit SimHash over word hashes (unit weights). Near-dups have
    * small Hamming distance between simhashes. */
  def simHash(text: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val words = s.toLowerCase.trim.split("\\s+")
        val acc = new Array[Int](64)
        words.foreach { w =>
          val h = saltedHash(w, 0L)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
        var out = 0L
        var b = 0
        while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
        java.lang.Long.valueOf(out)
      }
    }
    f(text)
  }

  /** Hamming distance between two 64-bit simhashes (native algebra —
    * bit_count is codegen'd). */
  def simHashHamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-duplicate pairs with Hamming ≤ maxDist, via 16-bit
    * band buckets (pigeonhole: ≤3 flipped bits over 4 bands leave at
    * least one band identical — exact recall for maxDist ≤ 3, candidate
    * prefilter beyond). */
  def simHashDupPairs(df: DataFrame, id: Column, text: Column,
                      maxDist: Int): DataFrame = {
    val withSh = df.select(id.as("i"), simHash(text).as("sh"))
    val banded = withSh.select(col("i"), col("sh"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("b"),
            shiftright(col("sh"), b * 16).bitwiseAND(lit(0xffffL))
              .as("h"))): _*)).as("band"))
      .select(col("i"), col("sh"),
        col("band.b").as("b"), col("band.h").as("h"))
    val l = banded.as("l")
    val r = banded.as("r")
    l.join(r, col("l.b") === col("r.b") && col("l.h") === col("r.h") &&
        col("l.i") < col("r.i"))
      .select(col("l.i").as("id1"), col("r.i").as("id2"),
        col("l.sh").as("sh1"), col("r.sh").as("sh2"))
      .distinct()
      .withColumn("hamming", simHashHamming(col("sh1"), col("sh2")))
      .filter(col("hamming") <= maxDist)
      .select(col("id1"), col("id2"), col("hamming"))
  }
}
