package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Block-manager hygiene for operators that persist intermediates.
  *
  * An iterative or self-joining operator that calls `persist()` /
  * `localCheckpoint()` internally would otherwise leave its blocks in
  * the block manager for the session's lifetime (the ContextCleaner
  * only reclaims them after a driver GC notices the RDD is
  * unreachable — by default every 30 min). On a long-lived cluster
  * session those leaks evict useful cache and bleed GC time into every
  * subsequent job, so operators clean up after themselves with
  * [[scoped]]. */
object Release {

  /** Run `body`, eagerly materialize its result via
    * `localCheckpoint(true)` (which also cuts lineage), then unpersist
    * every RDD `body` newly persisted — its intermediates — keeping
    * only the blocks backing the returned frame.
    *
    * The returned frame is therefore: (a) fully computed, (b) safe to
    * scan any number of times without recomputation, and (c) the ONLY
    * new resident it leaves in the block manager. Callers that are done
    * with it can free it with [[free]]. */
  def scoped(spark: SparkSession)(body: => DataFrame): DataFrame = {
    val sc = spark.sparkContext
    val pre = sc.getPersistentRDDs.keySet
    val out = body
    val mid = sc.getPersistentRDDs.keySet
    val ck = out.localCheckpoint(eager = true)
    val ckIds = sc.getPersistentRDDs.keySet -- mid
    // everything `body` newly persisted that is not the checkpoint
    // itself is an intermediate — drop it. (Unpersisting a
    // CacheManager-backed frame's RDD this way only drops the blocks;
    // if the frame is ever reused Spark transparently rebuilds the
    // cache, so semantics are preserved.)
    (mid -- pre -- ckIds).foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    ck
  }

  /** Like [[scoped]] for computations ending in a DRIVER value: run
    * `body` (which should fully consume its DataFrames — e.g. end in
    * `head`/`collect`), then unpersist every RDD it newly persisted.
    * For CacheManager-backed frames this drops the blocks only (the
    * cache entry transparently rebuilds if ever reused — semantics
    * preserved, memory returned). */
  def scopedValue[A](spark: SparkSession)(body: => A): A = {
    val sc = spark.sparkContext
    val pre = sc.getPersistentRDDs.keySet
    val out = body
    (sc.getPersistentRDDs.keySet -- pre).foreach { id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
    }
    out
  }

  /** Drop the blocks behind a frame returned by [[scoped]] (or any
    * frame whose plan is a single checkpointed/persisted RDD scan). */
  def free(df: DataFrame): Unit = {
    val sc = df.sparkSession.sparkContext
    df.unpersist(blocking = false)
    // a localCheckpoint-backed frame is not in the CacheManager; walk
    // the physical RDD chain and unpersist any persisted ancestor
    def walk(r: org.apache.spark.rdd.RDD[_]): Unit = {
      if (r.getStorageLevel.isValid) r.unpersist(blocking = false)
      r.dependencies.foreach(d => walk(d.rdd))
    }
    try walk(df.queryExecution.toRdd) catch { case _: Throwable => }
  }
}
