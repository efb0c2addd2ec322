package graft

/** Time a single SparkEntry query repeatedly: `runMain graft.TimeOne
  * <queryName> <sfDir> [reps]`. Dev tool for iterating on one
  * operator's plan without paying the full bench sweep. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JVM warmup
    val fn = SparkEntry.queries(name)
    if (sys.env.contains("GRAFT_SHOW"))
      fn(spark, sfDir).show(50, truncate = false)
    for (r <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] $name rep$r: $sec%.3f s ($n rows)")
    }
    spark.stop()
  }
}
