package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints — Schleimer, Wilkerson & Aiken 2003
  * (the MOSS plagiarism detector, §3 "robust winnowing"): hash every
  * word k-gram, slide a window of `w` consecutive gram hashes, and
  * select each window's MINIMAL hash (rightmost occurrence on ties);
  * the distinct selected (position, hash) pairs are the document's
  * fingerprints. Density is ~2/(w+1) of the gram count, and the paper's
  * guarantee holds at word resolution: any run of ≥ w+k-1 words shared
  * by two documents contributes at least one IDENTICAL fingerprint
  * hash to both — so shared-fingerprint counting finds every long
  * enough overlap, unlike MinHash's probabilistic recall.
  *
  * Gram hashes are the first 12 hex chars of md5(gram) as a 48-bit
  * integer — deliberately engine-portable (the q_winnow oracle replays
  * hash values, window minima, tie-breaks and the pair counts in SQL).
  * Collisions at 2⁻⁴⁸ merge two fingerprints; they can only over-count
  * sharing, never drop a true overlap.
  *
  * Scale shape: one explode to (doc, pos, hash48), one per-doc window
  * (partitioned by doc — bounded by document length, never corpus
  * size), one distinct. Pair detection groups by fingerprint hash and
  * joins within hash buckets only — quadratic work is confined to
  * documents that actually share a fingerprint.
  */
object WinnowOps {

  /** 48-bit engine-portable gram hash. */
  private def hash48(g: Column): Column =
    conv(substring(md5(g), 1, 12), 16, 10).cast("long")

  /** Fingerprints (doc_id, fp_pos, fp_hash): the winnowed selection.
    * Documents with fewer than k+w-1 words have no full window and are
    * absent. */
  def fingerprints(df: DataFrame, id: Column, text: Column,
                   k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1,
      s"winnowing: k and w must be >= 1, got ($k, $w)")
    val grams = df.select(id.as("doc_id"),
        posexplode(TextOps.wordNgrams(text, k)).as(Seq("pos", "g")))
      .select(col("doc_id"), col("pos"), hash48(col("g")).as("gh"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val win = byDoc.rowsBetween(0, w - 1)
    // rightmost-min tie rule: lexicographic min of (gh, -pos) picks
    // the smallest hash, then the LARGEST position among equal hashes
    val sel = min(struct(col("gh"), (-col("pos")).as("np"))).over(win)
    val nGrams = count(lit(1)).over(
      Window.partitionBy(col("doc_id")))
    grams
      .withColumn("__sel", sel)
      .withColumn("__n", nGrams)
      // only FULL windows select (positions 0 .. n-w)
      .filter(col("pos") <= col("__n") - w)
      .select(col("doc_id"), (-col("__sel.np")).as("fp_pos"),
        col("__sel.gh").as("fp_hash"))
      .distinct()
  }

  /** Document pairs sharing ≥ `minShared` fingerprint hashes, with the
    * shared count — the detection join. Hash-bucket self-join: only
    * documents sharing a fingerprint ever pair. */
  def sharedFingerprintPairs(fps: DataFrame,
                             minShared: Int = 2): DataFrame = {
    require(minShared >= 1,
      s"sharedFingerprintPairs: minShared must be >= 1, got $minShared")
    val f = fps.select(col("doc_id"), col("fp_hash")).distinct()
    f.as("l").join(f.as("r"),
        col("l.fp_hash") === col("r.fp_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("id1"), col("r.doc_id").as("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
