package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bradley–Terry preference-strength fitting via the MM algorithm
  * (Hunter 2004, "MM algorithms for generalized Bradley–Terry
  * models") — the aggregation step for pairwise preference data
  * (RLHF comparison logs, A/B evals, tournaments): given (winner,
  * loser) rows, find strengths s with p(i beats j) = s_i/(s_i+s_j)
  * maximizing the likelihood. The MM update
  *
  *   s_i' = W_i / Σ_{j pairs with i} n_ij/(s_i+s_j)
  *
  * (W_i = wins of i, n_ij = games between i and j) monotonically
  * increases the likelihood; strengths are renormalized to mean 1
  * every round (the BT scale is only defined up to a constant).
  *
  * The MLE requires every player to have ≥ 1 win and ≥ 1 loss
  * (undefeated players diverge to ∞) — enforced with a loud require.
  *
  * Scale shape: wins and the unordered pair-count table aggregate
  * once from the match log (map-side combined; the shuffle is
  * player/pair-table sized, never match-log sized) and the pair table
  * is persisted; each iteration is one join + one groupBy over it.
  * Below `graft.maxLocalBt` pairs the iteration runs on the driver —
  * the same bounded-finish pattern as pageRank (a k-round distributed
  * loop is pure scheduler overhead when the pair table fits in
  * memory); beyond it, the distributed loop with per-round
  * localCheckpoint lineage cuts takes over.
  */
object PreferenceOps {

  def bradleyTerry(df: DataFrame, winner: Column, loser: Column,
                   iterations: Int = 15): DataFrame = {
    require(iterations >= 1,
      s"bradleyTerry: iterations must be >= 1, got $iterations")
    val spark = df.sparkSession
    // Release.scoped: materialize the player-table-sized result, then
    // drop every intermediate persisted below (wins/losses/pairs/the
    // iteration state) — they'd otherwise outlive the fit for the
    // session's lifetime. Unpersisting only AFTER the result is
    // checkpointed also means the final join still reads the cached
    // pair/win tables instead of recomputing them from the match log.
    graft.util.Release.scoped(spark) {
    val m = df.select(winner.cast("long").as("w"),
        loser.cast("long").as("l"))
      .filter(col("w").isNotNull && col("l").isNotNull &&
        col("w") =!= col("l"))
    val wins = m.groupBy(col("w").as("id"))
      .agg(count(lit(1)).as("wins"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val losses = m.groupBy(col("l").as("id"))
      .agg(count(lit(1)).as("losses"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = m.select(least(col("w"), col("l")).as("a"),
        greatest(col("w"), col("l")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val players = wins.select(col("id"))
      .unionAll(losses.select(col("id"))).distinct()
    val nBad = players.join(wins, Seq("id"), "left_anti").count() +
      players.join(losses, Seq("id"), "left_anti").count()
    require(nBad == 0,
      s"bradleyTerry: $nBad player(s) have no win or no loss — the " +
        "BT MLE diverges for them. Filter them out (or add " +
        "regularizing pseudo-games) before fitting.")
    val nP = wins.count() // == player count after the check
    val nPairs = pairs.count()
    val cap = java.lang.Long.getLong("graft.maxLocalBt", 2000000L)
    val result: DataFrame =
      if (nPairs <= cap && nP <= cap) {
        // driver fast path: identical math, zero per-iteration jobs
        val pa = pairs.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2)))
        val wmap = wins.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val ids = wmap.keys.toArray.sorted
        val idx = ids.zipWithIndex.toMap
        val wArr = ids.map(wmap(_).toDouble)
        var s = Array.fill(ids.length)(1.0)
        var it = 0
        while (it < iterations) {
          val den = new Array[Double](ids.length)
          pa.foreach { case (a, b, n) =>
            val t = n / (s(idx(a)) + s(idx(b)))
            den(idx(a)) += t; den(idx(b)) += t
          }
          val next = Array.tabulate(ids.length)(i => wArr(i) / den(i))
          val mean = next.sum / ids.length
          var i = 0
          while (i < ids.length) { next(i) /= mean; i += 1 }
          s = next
          it += 1
        }
        import scala.jdk.CollectionConverters._
        spark.createDataFrame(
          ids.indices.map(i =>
            org.apache.spark.sql.Row(ids(i), s(i))).asJava,
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType, nullable = false),
            org.apache.spark.sql.types.StructField("strength",
              org.apache.spark.sql.types.DoubleType,
              nullable = false))))
      } else {
        var s = wins.select(col("id"), lit(1.0).as("strength"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        var it = 0
        while (it < iterations) {
          val j = pairs
            .join(s.select(col("id").as("a"),
              col("strength").as("sa")), Seq("a"))
            .join(s.select(col("id").as("b"),
              col("strength").as("sb")), Seq("b"))
            .select(col("a"), col("b"),
              (col("n") / (col("sa") + col("sb"))).as("t"))
          val den = j.select(col("a").as("id"), col("t"))
            .unionAll(j.select(col("b").as("id"), col("t")))
            .groupBy(col("id")).agg(sum(col("t")).as("den"))
          val raw = wins.join(den, Seq("id"))
            .select(col("id"),
              (col("wins").cast("double") / col("den")).as("st"))
          val tot = raw.agg(sum(col("st")).as("tot"))
          val next = raw.crossJoin(tot)
            .select(col("id"),
              (col("st") * nP / col("tot")).as("strength"))
            .localCheckpoint(false)
            .persist(StorageLevel.MEMORY_AND_DISK)
          next.count()
          s.unpersist(blocking = false)
          s = next
          it += 1
        }
        s
      }
    val games = pairs.select(col("a").as("id"), col("n"))
      .unionAll(pairs.select(col("b").as("id"), col("n")))
      .groupBy(col("id")).agg(sum(col("n")).as("games"))
    result.join(wins, Seq("id")).join(games, Seq("id"))
      .select(col("id"), col("strength"), col("wins"), col("games"))
    }
  }
}
