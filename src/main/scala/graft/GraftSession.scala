package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession configuration for all graft entry points.
  * testdata's events.parquet stores ts as TIMESTAMP(NANOS) which Spark 4
  * rejects unless nanosAsLong is set (reads as LongType nanos — still a
  * valid monotone order column, which is all the library needs). */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder = {
    // Executor-shape validation hook: GRAFT_MASTER=local-cluster[4,8,8192]
    // runs the identical entry points across real worker JVMs — actual
    // closure/broadcast serialization and shuffle transport instead of
    // local mode's same-JVM shortcuts. GRAFT_JARS must then point at the
    // packaged app jar (sbt package) so executors can load graft classes.
    val master = sys.env.getOrElse("GRAFT_MASTER", s"local[$cpus]")
    val b = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      // Coalesce small post-shuffle partitions to the advisory SIZE
      // instead of stopping early to "maximize parallelism" (the
      // Spark docs themselves recommend false): at any scale this
      // respects advisoryPartitionSizeInBytes, and on small shuffles
      // it stops scheduling dozens of near-empty reduce tasks per
      // stage. Env-overridable for A/B.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_AQE_PARALLELISM_FIRST", "false"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Bucketed-table writes (sources.Bucketing) register external
      // tables; keep the managed-table root out of the repo tree.
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      // Reclaim dropped RDD/broadcast blocks in long-lived sessions
      // (Spark's default 30 min lets unreachable blocks pile up and
      // evict useful cache on a busy cluster). NOT shorter than 10 min:
      // this timer forces a FULL GC, which pauses a large driver heap
      // for seconds — at 2 min it landed mid-query often enough to
      // double a benchmark query's wall-clock (r6: q_dup_clusters
      // 6.4 s → 12.5 s was exactly one such pause). Operators already
      // free their own blocks eagerly via Release.scoped, so the timer
      // is a backstop, not the primary hygiene. Env-overridable for
      // harnesses that do their own inter-query GC.
      .config("spark.cleaner.periodicGC.interval",
        sys.env.getOrElse("GRAFT_PERIODIC_GC", "10min"))
      // Polars-style permissive numerics: x/0 → null, not an error.
      // The reference's kernels never raise on degenerate denominators
      // (e.g. confusion-matrix ratios with an empty class).
      .config("spark.sql.ansi.enabled", "false")
    val b2 = sys.env.get("GRAFT_JARS").fold(b)(b.config("spark.jars", _))
    // Executor heap for multi-JVM shapes (local-cluster[w,c,mem] sets
    // WORKER capacity only — spark.executor.memory stays at the 1g
    // default unless set, which under-provisions every executor; the
    // r11 skew run at executor shape surfaced exactly that). Worker
    // capacity must cover memory + overhead (max(384m, 10%)).
    sys.env.get("GRAFT_EXECUTOR_MEM")
      .fold(b2)(b2.config("spark.executor.memory", _))
  }
}
