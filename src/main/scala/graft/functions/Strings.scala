package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String similarity / distance / cleaning functions (SURVEY §2.8;
  * reference python/polars_ds/exprs/string.py + src/str_ext/).
  *
  * Elementwise kernels are Scala UDFs over codegen'd inputs — the JVM
  * implementations mirror the published rapidfuzz/strsim algorithms the
  * reference wraps. Pure-regex ops (whitespace, non-ASCII, number
  * extraction) stay as native `Column` expressions so they remain inside
  * whole-stage codegen. `levenshtein` uses Spark's built-in (already a
  * native Catalyst expression with an optional threshold).
  */
object Strings {

  // ---------- similarity kernels (pure JVM, referentially transparent) --

  // The four fuzzy kernels below are public: they are the shared
  // compute bodies of the native codegen expressions in
  // org.apache.spark.sql.graft.StringDistances (outside the graft
  // package), as well as of this object's interpreted fallbacks.
  def jaroSim(s1: String, s2: String): Double = {
    val (a, b) = (s1.toCharArray, s2.toCharArray)
    val (la, lb) = (a.length, b.length)
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aM = new Array[Boolean](la)
    val bM = new Array[Boolean](lb)
    var matches = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bM(j) && a(i) == b(j)) {
          aM(i) = true; bM(j) = true; matches += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var (k, t) = (0, 0)
    i = 0
    while (i < la) {
      if (aM(i)) {
        while (!bM(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    // rapidfuzz convention (the reference delegates to rapidfuzz jaro,
    // src/str_ext/jaro.rs:14-17): the half-transposition count is
    // INTEGER-halved — an odd count floors, unlike the textbook t/2.
    // DuckDB shares this convention, which gives the fuzzy queries a
    // cross-engine oracle.
    (m / la + m / lb + (m - t / 2) / m) / 3.0
  }

  def jaroWinklerSim(s1: String, s2: String,
                     p: Double = 0.1): Double = {
    val j = jaroSim(s1, s2)
    // rapidfuzz convention (the reference delegates to rapidfuzz
    // jaro_winkler, src/str_ext/jaro.rs:20-26): the prefix boost only
    // applies when the Jaro similarity clears 0.7 — below that the
    // score IS the Jaro score. DuckDB implements the same convention.
    if (j <= 0.7) return j
    var l = 0
    val maxL = math.min(4, math.min(s1.length, s2.length))
    while (l < maxL && s1.charAt(l) == s2.charAt(l)) l += 1
    j + l * p * (1.0 - j)
  }

  /** Optimal string alignment (restricted Damerau) distance, over
    * CODE POINTS like the reference's rapidfuzz chars() iteration
    * (src/str_ext/osa.rs) — a surrogate-pair character is one edit,
    * not two. */
  def osaDist(str1: String, str2: String): Int = {
    val s1 = str1.codePoints.toArray
    val s2 = str2.codePoints.toArray
    val (la, lb) = (s1.length, s2.length)
    if (la == 0) return lb
    if (lb == 0) return la
    val d = Array.ofDim[Int](la + 1, lb + 1)
    for (i <- 0 to la) d(i)(0) = i
    for (j <- 0 to lb) d(0)(j) = j
    for (i <- 1 to la; j <- 1 to lb) {
      val cost = if (s1(i - 1) == s2(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
      if (i > 1 && j > 1 && s1(i - 1) == s2(j - 2) &&
          s1(i - 2) == s2(j - 1))
        d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + 1)
    }
    d(la)(lb)
  }

  /** Full Damerau–Levenshtein (unrestricted transpositions), over
    * CODE POINTS (src/str_ext/levenshtein.rs:261 str_d_leven). */
  def damerauDist(str1: String, str2: String): Int =
    damerauDistArr(str1.codePoints.toArray, str2.codePoints.toArray)

  /** UTF-8 bytes as unsigned ints — the edit unit under as_bytes
    * (string.py:472: rapidfuzz over s.bytes() instead of s.chars()). */
  private def utf8Units(s: String): Array[Int] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).map(_ & 0xff)

  private[functions] def levenDistArr(s1: Array[Int],
                                      s2: Array[Int]): Int = {
    if (s1.isEmpty) return s2.length
    if (s2.isEmpty) return s1.length
    val d = Array.tabulate(s2.length + 1)(identity)
    var prevDiag = 0
    for (i <- 1 to s1.length) {
      prevDiag = d(0); d(0) = i
      for (j <- 1 to s2.length) {
        val t = d(j)
        d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
          prevDiag + (if (s1(i - 1) == s2(j - 1)) 0 else 1))
        prevDiag = t
      }
    }
    d(s2.length)
  }

  private def damerauDistArr(s1: Array[Int], s2: Array[Int]): Int = {
    val (la, lb) = (s1.length, s2.length)
    if (la == 0) return lb
    if (lb == 0) return la
    val maxDist = la + lb
    val da = scala.collection.mutable.HashMap.empty[Int, Int]
    val d = Array.ofDim[Int](la + 2, lb + 2)
    d(0)(0) = maxDist
    for (i <- 0 to la) { d(i + 1)(0) = maxDist; d(i + 1)(1) = i }
    for (j <- 0 to lb) { d(0)(j + 1) = maxDist; d(1)(j + 1) = j }
    for (i <- 1 to la) {
      var db = 0
      for (j <- 1 to lb) {
        val k = da.getOrElse(s2(j - 1), 0)
        val l = db
        val cost = if (s1(i - 1) == s2(j - 1)) { db = j; 0 }
          else 1
        d(i + 1)(j + 1) = math.min(
          math.min(d(i)(j) + cost, d(i + 1)(j) + 1),
          math.min(d(i)(j + 1) + 1,
            d(k)(l) + (i - k - 1) + 1 + (j - l - 1)))
      }
      da(s1(i - 1)) = i
    }
    d(la + 1)(lb + 1)
  }

  def ngramSet(s: String, n: Int): Set[String] =
    if (s.length < n) Set(s) else (0 to s.length - n).map(i => s.substring(i, i + n)).toSet

  def lcsSubstrLen(s1: String, s2: String): Int = {
    if (s1.isEmpty || s2.isEmpty) return 0
    val prev = new Array[Int](s2.length + 1)
    val cur = new Array[Int](s2.length + 1)
    var best = 0
    for (i <- 1 to s1.length) {
      for (j <- 1 to s2.length) {
        cur(j) = if (s1.charAt(i - 1) == s2.charAt(j - 1)) prev(j - 1) + 1
          else 0
        if (cur(j) > best) best = cur(j)
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
    }
    best
  }

  def lcsSubseqLen(s1: String, s2: String): Int = {
    if (s1.isEmpty || s2.isEmpty) return 0
    val prev = new Array[Int](s2.length + 1)
    val cur = new Array[Int](s2.length + 1)
    for (i <- 1 to s1.length) {
      for (j <- 1 to s2.length) {
        cur(j) = if (s1.charAt(i - 1) == s2.charAt(j - 1)) prev(j - 1) + 1
          else math.max(prev(j), cur(j - 1))
      }
      System.arraycopy(cur, 0, prev, 0, cur.length)
    }
    prev(s2.length)
  }

  // ---------- Column API ------------------------------------------------

  private def udf2d(f: (String, String) => Double) =
    udf { (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Double.valueOf(f(a, b))
    }
  private def udf2i(f: (String, String) => Int) =
    udf { (a: String, b: String) =>
      if (a == null || b == null) null
      else java.lang.Integer.valueOf(f(a, b))
    }

  /** Jaro similarity — native codegen expression. (string.py:439
    * str_jaro) */
  def strJaro(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeFunctions.jaroNative(a, b)

  /** Jaro–Winkler similarity — native codegen expression; `weight` is
    * the prefix-boost scale (string.py:404 str_jw, weight kwarg,
    * typical 0.1). */
  def strJaroWinkler(a: Column, b: Column, weight: Double = 0.1): Column =
    org.apache.spark.sql.graft.NativeFunctions.jaroWinklerNative(
      a, b, weight)

  /** Optimal-string-alignment distance — native codegen expression.
    * (string.py:643 str_osa) */
  def strOsa(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeFunctions.osaNative(a, b)

  /** Damerau–Levenshtein distance — native codegen expression.
    * (string.py:461 str_d_leven) */
  def strDamerau(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeFunctions.damerauNative(a, b)

  /** Damerau–Levenshtein with the reference's flags (string.py:461
    * str_d_leven): `asBytes` edits UTF-8 bytes instead of code points;
    * `returnSim` → 1 − d/max(len) in matching units. */
  def strDamerau(a: Column, b: Column, asBytes: Boolean,
                 returnSim: Boolean): Column = {
    val d: Column =
      if (asBytes)
        udf2i((x, y) => damerauDistArr(utf8Units(x), utf8Units(y)))(a, b)
      else strDamerau(a, b)
    if (!returnSim) d
    else lit(1.0) - d.cast("double") /
      (if (asBytes) greatest(octet_length(a), octet_length(b))
       else greatest(length(a), length(b))).cast("double")
  }

  /** Levenshtein distance with the reference's flags (string.py:472
    * str_leven): Spark's native expression on the code-point path,
    * byte-unit DP under `asBytes`; `returnSim` → 1 − d/max(len). */
  def strLeven(a: Column, b: Column, asBytes: Boolean = false,
               returnSim: Boolean = false): Column = {
    val d: Column =
      if (asBytes)
        udf2i((x, y) => levenDistArr(utf8Units(x), utf8Units(y)))(a, b)
      else levenshtein(a, b)
    if (!returnSim) d
    else lit(1.0) - d.cast("double") /
      (if (asBytes) greatest(octet_length(a), octet_length(b))
       else greatest(length(a), length(b))).cast("double")
  }

  /** Keep rows whose distance to `other` is ≤ `bound`
    * (string.py:22 filter_by_levenshtein). The code-point path uses the
    * native 3-arg levenshtein whose threshold short-circuits the DP —
    * at scale this is the predicate to push, not a full distance. */
  def filterByLevenshtein(c: Column, other: Column, bound: Int,
                          asBytes: Boolean = false): Column =
    if (asBytes) strLeven(c, other, asBytes = true) <= bound
    else levenshtein(c, other, bound) >= 0

  /** Keep rows within hamming distance `bound` (string.py:77
    * filter_by_hamming); null (length-mismatch, no pad) never passes. */
  def filterByHamming(c: Column, other: Column, bound: Int,
                      pad: Boolean = false): Column =
    coalesce(strHamming(c, other, pad) <= bound, lit(false))

  /** Hamming distance; null if lengths differ unless `pad` (then the
    * shorter is right-padded, mismatches counted). (string.py:117) */
  def strHamming(a: Column, b: Column, pad: Boolean = false): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null) null
      else if (x.length != y.length && !pad) null
      else {
        val n = math.max(x.length, y.length)
        var (c, i) = (0, 0)
        while (i < n) {
          val cx = if (i < x.length) x.charAt(i) else '\u0000'
          val cy = if (i < y.length) y.charAt(i) else '\u0000'
          if (cx != cy) c += 1
          i += 1
        }
        java.lang.Integer.valueOf(c)
      }
    }
    f(a, b)
  }

  /** Char n-gram Jaccard similarity — native codegen expression.
    * (string.py:230 str_jaccard) */
  def strJaccard(a: Column, b: Column, n: Int = 2): Column =
    org.apache.spark.sql.graft.NativeFunctions.ngramSimNative(a, b, n,
      org.apache.spark.sql.graft.NgramSetSimilarity.Jaccard)

  /** Sørensen–Dice similarity over char n-grams — native codegen
    * expression. (string.py:308) */
  def strSorensenDice(a: Column, b: Column, n: Int = 2): Column =
    org.apache.spark.sql.graft.NativeFunctions.ngramSimNative(a, b, n,
      org.apache.spark.sql.graft.NgramSetSimilarity.Dice)

  /** Overlap coefficient over char n-grams — native codegen
    * expression. (string.py:269) */
  def strOverlapCoeff(a: Column, b: Column, n: Int = 2): Column =
    org.apache.spark.sql.graft.NativeFunctions.ngramSimNative(a, b, n,
      org.apache.spark.sql.graft.NgramSetSimilarity.Overlap)

  /** Tversky similarity with α,β weights over char n-grams — native
    * codegen expression. (string.py:347) */
  def strTversky(a: Column, b: Column, alpha: Double, beta: Double,
                 n: Int = 2): Column =
    org.apache.spark.sql.graft.NativeFunctions.ngramSimNative(a, b, n,
      org.apache.spark.sql.graft.NgramSetSimilarity.Tversky, alpha, beta)

  /** Longest common substring length — native codegen expression.
    * (string.py:547 str_lcs_substr) */
  def strLcsSubstr(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeFunctions.lcsLenNative(a, b,
      subsequence = false)

  /** Longest common subsequence length — native codegen expression.
    * (string.py:602 str_lcs_subseq) */
  def strLcsSubseq(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeFunctions.lcsLenNative(a, b,
      subsequence = true)

  /** The longest common substring ITSELF (the reference's default
    * str_lcs_substr return, test_string.py:155). DP runs over code
    * points, not Java chars — the reference's own vectors include
    * surrogate-pair emoji where char-level DP would split a pair. */
  def strLcsSubstrStr(a: Column, b: Column): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null) null
      else {
        val s1 = x.codePoints.toArray; val s2 = y.codePoints.toArray
        var bestLen = 0; var bestEnd = 0
        val prev = new Array[Int](s2.length + 1)
        val cur = new Array[Int](s2.length + 1)
        var i = 1
        while (i <= s1.length) {
          var j = 1
          while (j <= s2.length) {
            cur(j) = if (s1(i - 1) == s2(j - 1)) prev(j - 1) + 1 else 0
            if (cur(j) > bestLen) { bestLen = cur(j); bestEnd = i }
            j += 1
          }
          System.arraycopy(cur, 0, prev, 0, cur.length)
          i += 1
        }
        new String(s1, bestEnd - bestLen, bestLen)
      }
    }
    f(a, b)
  }

  /** The longest common subsequence ITSELF (string.py:602
    * str_lcs_subseq; test_string.py:174 AGGTAB/GXTXAYB -> GTAB),
    * code-point DP with backtracking. */
  def strLcsSubseqStr(a: Column, b: Column): Column = {
    val f = udf { (x: String, y: String) =>
      if (x == null || y == null) null
      else {
        val s1 = x.codePoints.toArray; val s2 = y.codePoints.toArray
        val dp = Array.ofDim[Int](s1.length + 1, s2.length + 1)
        var i = 1
        while (i <= s1.length) {
          var j = 1
          while (j <= s2.length) {
            dp(i)(j) =
              if (s1(i - 1) == s2(j - 1)) dp(i - 1)(j - 1) + 1
              else math.max(dp(i - 1)(j), dp(i)(j - 1))
            j += 1
          }
          i += 1
        }
        val out = new Array[Int](dp(s1.length)(s2.length))
        var k = out.length; var ii = s1.length; var jj = s2.length
        while (k > 0) {
          if (s1(ii - 1) == s2(jj - 1)) {
            k -= 1; out(k) = s1(ii - 1); ii -= 1; jj -= 1
          } else if (dp(ii - 1)(jj) >= dp(ii)(jj - 1)) ii -= 1
          else jj -= 1
        }
        new String(out, 0, out.length)
      }
    }
    f(a, b)
  }

  /** LCS-subsequence distance max(|a|,|b|) − LCSseq (code points;
    * string.py:563 str_lcs_subseq_dist, test_string.py:129). */
  def strLcsSubseqDist(a: Column, b: Column): Column =
    udf2i { (x, y) =>
      val s1 = x.codePoints.toArray; val s2 = y.codePoints.toArray
      val dp = Array.ofDim[Int](s1.length + 1, s2.length + 1)
      var i = 1
      while (i <= s1.length) {
        var j = 1
        while (j <= s2.length) {
          dp(i)(j) =
            if (s1(i - 1) == s2(j - 1)) dp(i - 1)(j - 1) + 1
            else math.max(dp(i - 1)(j), dp(i)(j - 1))
          j += 1
        }
        i += 1
      }
      math.max(s1.length, s2.length) - dp(s1.length)(s2.length)
    }(a, b)

  /** rapidfuzz-style indel ratio: 1 − indel/(|a|+|b|),
    * indel = |a|+|b| − 2·LCSseq — native codegen expression.
    * (string.py:679 str_fuzz) */
  def strFuzz(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.NativeFunctions.fuzzRatioNative(a, b)

  /** Levenshtein similarity 1 − d/max(len). (string.py:504 return_sim) */
  def strLevenSim(a: Column, b: Column): Column =
    lit(1.0) - levenshtein(a, b).cast("double") /
      greatest(length(a), length(b)).cast("double")

  /** Vocabulary-similarity gate (string.py:702 similar_to_vocab):
    * true when the column is similar to the vocab words under the
    * chosen metric ("lv" | "dlv" | "osa" | "jw" similarity) and
    * strategy ("avg" mean-sim ≥ t, "all", "any"). Pure Column
    * algebra — one expression per vocab word, no UDF dispatch beyond
    * the underlying distance kernels. */
  def similarToVocab(c: Column, vocab: Seq[String], threshold: Double,
                     metric: String = "lv", strategy: String = "avg")
      : Column = {
    require(vocab.nonEmpty, "similarToVocab: empty vocab")
    // normalization lengths in CODE POINTS on both sides, matching the
    // units the distance kernels count: Spark's length() already counts
    // code points, and the vocab word uses codePointCount (w.length
    // would count UTF-16 units and skew the denominator for any vocab
    // word containing surrogate pairs)
    def sim(w: String): Column = metric match {
      case "lv" => strLevenSim(c, lit(w))
      case "dlv" => lit(1.0) - strDamerau(c, lit(w)).cast("double") /
        greatest(length(c), lit(w.codePointCount(0, w.length)))
      case "osa" => lit(1.0) - strOsa(c, lit(w)).cast("double") /
        greatest(length(c), lit(w.codePointCount(0, w.length)))
      case "jw" => strJaroWinkler(c, lit(w))
      case m => throw new IllegalArgumentException(s"metric $m")
    }
    val sims = vocab.map(sim)
    strategy match {
      case "all" => sims.map(_ >= threshold).reduce(_ && _)
      case "any" => sims.map(_ >= threshold).reduce(_ || _)
      case "avg" =>
        (sims.reduce(_ + _) / vocab.length.toDouble) >= threshold
      case s => throw new IllegalArgumentException(s"strategy $s")
    }
  }

  /** The reference's str_nearest (string.py:188; nearest_str.rs:60
    * pl_nearest_str): an AGGREGATE — the value of column `c` nearest
    * to `word`, considering only values within `threshold` distance
    * ("lv" Levenshtein or "hamming"; hamming skips values whose length
    * differs from the word's, rapidfuzz Err convention). Returns null
    * when nothing qualifies. The reference breaks distance ties by
    * first-seen row order, which has no distributed analog — ties here
    * break by (distance, value), deterministic under any partitioning.
    * Plan: one min_by aggregate; the lv distance uses Spark's native
    * 3-arg levenshtein, whose threshold short-circuits the DP. */
  def strNearest(c: Column, word: String, threshold: Int,
                 metric: String): Column = {
    require(threshold > 0, "strNearest: threshold must be > 0")
    val d: Column = metric match {
      case "lv" =>
        val raw = levenshtein(c, lit(word), threshold)
        when(raw >= 0, raw) // built-in yields -1 past the threshold
      case "hamming" =>
        when(strHamming(c, lit(word)) <= threshold,
          strHamming(c, lit(word)))
      case m => throw new IllegalArgumentException(
        s"strNearest: metric $m (want lv | hamming)")
    }
    // min_by skips rows with a null ordering key, so out-of-threshold
    // and null values never win
    min_by(c, when(d.isNotNull, struct(d, c)))
  }

  /** Nearest word in a (small, broadcast) vocabulary by Levenshtein —
    * the per-row companion to the aggregate [[strNearest]] (reference
    * users compose similar_to_vocab for this; kept as the engine's
    * vocab-snap primitive). */
  def strNearest(a: Column, vocab: Seq[String]): Column = {
    val f = udf { (x: String) =>
      if (x == null) null
      else vocab.minBy { v =>
        // small-vocab exact Levenshtein
        val d = Array.tabulate(v.length + 1)(identity)
        var prevDiag = 0
        for (i <- 1 to x.length) {
          prevDiag = d(0); d(0) = i
          for (j <- 1 to v.length) {
            val t = d(j)
            d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
              prevDiag + (if (x.charAt(i - 1) == v.charAt(j - 1)) 0 else 1))
            prevDiag = t
          }
        }
        d(v.length)
      }
    }
    f(a)
  }

  // ---------- case conversion / cleaning --------------------------------

  private val camelBoundary = "([a-z0-9])([A-Z])".r

  private def splitWords(s: String): Array[String] =
    s.replaceAll("([a-z0-9])([A-Z])", "$1 $2")
      .split("[\\s_\\-]+").filter(_.nonEmpty)

  /** to_snake_case. (string.py:152; src/str_ext/inflections.rs) */
  def toSnakeCase(c: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null else splitWords(s).map(_.toLowerCase).mkString("_")
    }
    f(c)
  }

  /** to_camel_case. */
  def toCamelCase(c: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        val w = splitWords(s).map(_.toLowerCase)
        if (w.isEmpty) ""
        else w.head + w.tail.map(_.capitalize).mkString
      }
    }
    f(c)
  }

  /** to_pascal_case. */
  def toPascalCase(c: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else splitWords(s).map(_.toLowerCase.capitalize).mkString
    }
    f(c)
  }

  /** to_constant_case (SCREAMING_SNAKE). */
  def toConstantCase(c: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null else splitWords(s).map(_.toUpperCase).mkString("_")
    }
    f(c)
  }

  /** Strip or replace non-ASCII chars. The strip case (empty repl) is a
    * single allocation-light char scan — ~10× the throughput of the
    * regex engine on document-sized strings; non-empty replacements
    * keep the regex path. (string.py:853 replace_non_ascii) */
  def replaceNonAscii(c: Column, repl: String = ""): Column =
    if (repl.isEmpty) {
      val f = udf { (s: String) =>
        if (s == null) null
        else {
          val sb = new java.lang.StringBuilder(s.length)
          var i = 0
          while (i < s.length) {
            val ch = s.charAt(i)
            if (ch <= 0x7F) sb.append(ch)
            i += 1
          }
          sb.toString
        }
      }
      f(c)
    } else regexp_replace(c, "[^\\x00-\\x7F]", repl)

  /** é→e etc: NFD-decompose then drop combining marks. (string.py:894) */
  // compiled once: replaceAll would recompile the pattern per row
  private val combiningMarks = java.util.regex.Pattern.compile("\\p{M}+")

  def removeDiacritics(c: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        // ASCII fast path: NFD is the identity and there are no marks
        var ascii = true
        var i = 0
        while (ascii && i < s.length) {
          if (s.charAt(i) >= 0x80) ascii = false
          i += 1
        }
        if (ascii) s
        else combiningMarks
          .matcher(Normalizer.normalize(s, Normalizer.Form.NFD))
          .replaceAll("")
      }
    }
    f(c)
  }

  /** Unicode normalization NFC/NFD/NFKC/NFKD. (str_cleaning.rs:65) */
  def normalizeString(c: Column, form: String): Column = {
    val nf = Normalizer.Form.valueOf(form.toUpperCase)
    val f = udf { (s: String) =>
      if (s == null) null else Normalizer.normalize(s, nf)
    }
    f(c)
  }

  /** only_spaces=true collapses runs of the space character only —
    * polars' `.str.replace_all(" +", " ")`, no trim (string.py:980). */
  def normalizeWhitespace(c: Column, onlySpaces: Boolean): Column =
    if (onlySpaces) regexp_replace(c, " +", " ")
    else normalizeWhitespace(c)

  /** Collapse runs of whitespace to single spaces + trim — one char
    * scan, matching `trim(regexp_replace(c, "\\s+", " "))` exactly
    * (Java regex \s = [ \t\n\x0B\f\r]). (string.py:963) */
  def normalizeWhitespace(c: Column): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else {
        @inline def isWs(ch: Char): Boolean =
          ch == ' ' || ch == '\t' || ch == '\n' || ch == '\u000B' ||
            ch == '\f' || ch == '\r'
        val sb = new java.lang.StringBuilder(s.length)
        var i = 0
        var pendingSpace = false
        while (i < s.length) {
          val ch = s.charAt(i)
          if (isWs(ch)) { if (sb.length > 0) pendingSpace = true }
          else {
            if (pendingSpace) { sb.append(' '); pendingSpace = false }
            sb.append(ch)
          }
          i += 1
        }
        sb.toString
      }
    }
    f(c)
  }

  /** Word-level dictionary replacement (broadcast map). (string.py:927) */
  def mapWords(c: Column, mapping: Map[String, String]): Column = {
    val f = udf { (s: String) =>
      if (s == null) null
      else s.split(" ").map(w => mapping.getOrElse(w, w)).mkString(" ")
    }
    f(c)
  }

  /** Extract all numbers as their RAW matched strings
    * (string.py:762 extract_numbers: "25" stays "25", not "25.0" —
    * the reference's dtype arg casts afterwards; use
    * `transform(_, _.cast(...))` on the result). `ignoreComma` strips
    * commas before matching so "1,000,000" extracts as one number;
    * `joinBy` joins the list into a single string. */
  def extractNumbers(c: Column, ignoreComma: Boolean = false,
                     joinBy: Option[String] = None): Column = {
    val base = if (ignoreComma) regexp_replace(c, ",", "") else c
    val arr = regexp_extract_all(base, lit("(-?[0-9]+\\.?[0-9]*)"), lit(1))
    joinBy.map(sep => array_join(arr, sep)).getOrElse(arr)
  }
}
