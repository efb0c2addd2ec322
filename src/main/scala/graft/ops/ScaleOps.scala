package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale patterns as first-class operators: skew-safe two-phase
  * aggregation and binned range joins. These exist because at 100 TB a
  * single hot key or an interval predicate turns the naive plan into
  * one straggler task (skew) or a cartesian product (range join);
  * both operators keep the declarative API while forcing the scalable
  * physical shape. */
object ScaleOps {

  /** Skew-safe aggregation: adds a random salt to the grouping key so a
    * hot key's rows spread over `salt` reduce tasks (phase 1), then
    * combines the per-salt partials (phase 2). Supported specs:
    * (func, col, out) with func ∈ sum|count|min|max|avg — the algebraic
    * aggregates whose partials compose; avg is carried as (sum, count)
    * and finished exactly in phase 2.
    *
    * Results are EXACTLY those of `df.groupBy(keys).agg(...)` (modulo
    * float summation order, like any distributed agg); the salt only
    * changes the partial-combine tree. Spark's map-side partial
    * aggregation already dedups within a task — the salt matters when a
    * hot key's post-partial traffic still swamps one reducer. */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int,
                specs: Seq[(String, String, String)]): DataFrame = {
    require(salt > 0, "salt must be positive")
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salt)).cast("int"))
    // phase 1: per (keys, salt) partials
    val p1 = specs.flatMap { case (f, c, out) => f match {
      case "sum"   => Seq(sum(col(c)).as(s"_s_$out"))
      case "count" => Seq(count(col(c)).as(s"_c_$out"))
      case "min"   => Seq(min(col(c)).as(s"_mn_$out"))
      case "max"   => Seq(max(col(c)).as(s"_mx_$out"))
      case "avg"   => Seq(sum(col(c)).as(s"_s_$out"),
        count(col(c)).as(s"_c_$out"))
      case other => throw new IllegalArgumentException(
        s"saltedAgg: unsupported '$other' (algebraic only)")
    }}
    val phase1 = salted.groupBy((keys :+ "_salt").map(col): _*)
      .agg(p1.head, p1.tail: _*)
    // phase 2: combine partials per key
    val p2 = specs.map { case (f, _, out) => f match {
      case "sum"   => sum(col(s"_s_$out")).as(out)
      case "count" => sum(col(s"_c_$out")).as(out)
      case "min"   => min(col(s"_mn_$out")).as(out)
      case "max"   => max(col(s"_mx_$out")).as(out)
      case "avg"   => (sum(col(s"_s_$out")) / sum(col(s"_c_$out"))).as(out)
    }}
    phase1.groupBy(keys.map(col): _*).agg(p2.head, p2.tail: _*)
  }

  /** Point-in-interval range join via binning: left points land in one
    * bin of width `binWidth`; right intervals explode into every bin
    * they overlap (`sequence` — codegen'd, no UDF); the join is then a
    * plain shuffled equi-join on the bin (+ optional equi-keys) with an
    * exact interval check. Each qualifying pair meets exactly once (the
    * point's bin is unique), so no dedup pass is needed.
    *
    * Replaces the O(|L|·|R|) cartesian/BNLJ plan Spark produces for a
    * raw BETWEEN condition with shuffle cost |L| + |R|·(width/binWidth
    * + 1). Pick binWidth near the median interval width. Column names
    * must be disjoint between the two frames (alias before calling). */
  def binnedPointIntervalJoin(left: DataFrame, point: String,
                              right: DataFrame, lo: String, hi: String,
                              binWidth: Double,
                              keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val lb = left.withColumn("_bin",
      floor(col(point) / binWidth).cast("long"))
    val rb = right.withColumn("_bin", explode(sequence(
      floor(col(lo) / binWidth).cast("long"),
      floor(col(hi) / binWidth).cast("long"))))
    lb.join(rb, keys :+ "_bin")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("_bin")
  }

  /** Interval-overlap join via binning: BOTH sides explode into the
    * bins their interval touches, the join is a plain equi-join on the
    * bin, and the exact overlap check (`lHi >= rLo && rHi >= lLo`,
    * closed intervals) filters false bin-neighbors. An overlapping
    * pair shares every bin its intersection covers, so to meet exactly
    * once the match is only accepted in the CANONICAL bin — the bin of
    * `greatest(lLo, rLo)`, the intersection's left edge. No dedup
    * shuffle needed.
    *
    * Same scale story as [[binnedPointIntervalJoin]]: replaces the
    * cartesian/BNLJ plan with shuffle cost |L|·(span/bin+1) +
    * |R|·(span/bin+1). Pick binWidth near the median interval width;
    * column names must be disjoint (alias before calling). */
  def binnedIntervalOverlapJoin(left: DataFrame, lLo: String, lHi: String,
                                right: DataFrame, rLo: String, rHi: String,
                                binWidth: Double,
                                keys: Seq[String] = Nil): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bins(df: DataFrame, lo: String, hi: String) =
      df.withColumn("_bin", explode(sequence(
        floor(col(lo) / binWidth).cast("long"),
        floor(col(hi) / binWidth).cast("long"))))
    bins(left, lLo, lHi).join(bins(right, rLo, rHi), keys :+ "_bin")
      .filter(col(lHi) >= col(rLo) && col(rHi) >= col(lLo) &&
        col("_bin") === floor(greatest(col(lLo), col(rLo)) / binWidth)
          .cast("long"))
      .drop("_bin")
  }

  /** Z-order (Morton) key: interleaves the low `bits` bits of each
    * column so rows close in EVERY dimension get close keys. Sorting or
    * range-partitioning parquet by this key clusters multi-dimensional
    * locality into few files, which turns min/max footer statistics
    * into effective data skipping for predicates on ANY of the
    * interleaved columns — the layout story a 100 TB table needs, since
    * a plain sort only skips on its leading column.
    *
    * Inputs must be non-negative after casting to long (pre-bucket with
    * `pmod`/`width_bucket` as needed). Pure codegen'd column algebra
    * (shift/and/add) — no UDF. `bits * cols.size` must fit in 63. */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey: no columns")
    require(bits > 0 && bits * cols.size <= 63,
      s"zorderKey: $bits bits x ${cols.size} cols exceeds long range")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ + _)
  }

  /** Physically cluster a frame by the Z-order of `cols`: range-
    * partition on the interleaved key (so each output file owns a
    * compact key range), sort within partitions, drop the key. Write
    * the result to parquet to materialize the skipping-friendly
    * layout. */
  def zorderBy(df: DataFrame, cols: Seq[Column], bits: Int,
               numPartitions: Int): DataFrame =
    df.withColumn("_zkey", zorderKey(cols, bits))
      .repartitionByRange(numPartitions, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop("_zkey")

  /** Exact top-k rows per group by `score` (desc, ties toward smaller
    * `id`) via the bounded-heap [[graft.agg.TopKAgg]] — NOT a window
    * `row_number`: the window plan sorts and shuffles every row of
    * every group, while the aggregate's partial state is ≤ k pairs, so
    * map-side combine cuts shuffle volume to k·partitions per group.
    * Output: group keys + (rk, score, id), rk 1-based. Rows with a
    * null score or id are dropped first (the aggregate's tuple encoder
    * is primitive; nulls can never rank anyway). */
  def topKPerGroup(df: DataFrame, keys: Seq[Column], score: Column,
                   id: Column, k: Int): DataFrame = {
    import org.apache.spark.sql.{functions => F, Encoders}
    val f = F.udaf(new graft.agg.TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    df.filter(score.isNotNull && id.isNotNull)
      .groupBy(keys: _*)
      .agg(f(score.cast("double"), id.cast("long")).as("_topk"))
      .select(keys :+ posexplode(col("_topk")): _*)
      .select((keys :+ (col("pos") + 1).as("rk") :+
        col("col._1").as("score") :+ col("col._2").as("id")): _*)
  }

  /** Bloom-filter pre-join pruning: build a bloom filter over the small
    * side's join key, broadcast it, and filter the big side BEFORE the
    * shuffle join — rows that cannot match never enter the exchange.
    * At 100 TB this is the difference between shuffling the full fact
    * table and shuffling only the ~matching fraction (plus fpp). The
    * result is a SUPERSET of the true semi-join (bloom false positives
    * survive); follow with the exact join, which removes them — so
    * `bloomPrefilter(big, k, small, sk).join(small, ...)` is exactly
    * `big.join(small, ...)`.
    *
    * Mirrors what Spark's runtime row-level filtering does for shuffle
    * joins, but as an explicit operator usable on any boundary (e.g.
    * before a window or an aggregation keyed by the filtered key). */
  def bloomPrefilter(big: DataFrame, bigKey: Column,
                     small: DataFrame, smallKey: Column,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // Bloom over a type-agnostic 64-bit hash of the key (NOT a cast:
    // casting a non-numeric key to long yields null and would silently
    // drop every such row from the big side). xxhash64 is codegen'd on
    // both sides, so any join-able key type keeps the superset
    // contract. Null big-side keys hash to the seed value and at worst
    // survive the prefilter — the exact join drops them, as required.
    val bf = small.stat.bloomFilter(xxhash64(smallKey),
      expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) =>
      k != null && bc.value.mightContainLong(k))
      .withName("bloomMightContain") // visible marker in plan output
    big.filter(might(xxhash64(bigKey)))
  }
}
