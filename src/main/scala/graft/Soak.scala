package graft

/** Memory-pressure soak (r10 verdict ask #7): run EVERY SparkEntry
  * query sequentially in ONE constrained-heap JVM and prove the
  * persist/unpersist + `Release.scoped` discipline holds over a long
  * session — no OOM, and block-manager residency returns to baseline
  * between queries.
  *
  * Accounting per query: `sc.getPersistentRDDs` is snapshotted before
  * and after; blocks a query leaves behind are counted as
  * `left_behind` (operators may hand back a localCheckpoint'ed result
  * — the CALLER owns freeing it, so the soak frees them like a
  * disciplined caller and verifies residency actually returns to the
  * pre-query set). Heap is sampled post-GC after each query; the
  * printed JSON reports the peak, the final residual, and every query
  * that left blocks or failed.
  *
  * Run shape (the executor budget, not the bench's 40g driver):
  *   SPARK_DRIVER_MEM=8g SPARK_GRAFT_CPUS=8 \
  *     sbt -batch "runMain graft.Soak /root/testdata/sf0.1"
  */
object Soak {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: Soak <sfDir>")
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.builder(cpus)
      .config("spark.cleaner.periodicGC.interval", "2h")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val rt = Runtime.getRuntime
    def heapMb(): Long = { System.gc()
      (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024) }

    var peakHeap = 0L
    var errors = List.empty[String]
    var leavers = List.empty[(String, Int)]
    val t0 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val pre = sc.getPersistentRDDs.keySet
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errors ::= s"$name:${e.getClass.getSimpleName}" }
      val post = sc.getPersistentRDDs
      val left = (post.keySet -- pre).toSeq
      if (left.nonEmpty) leavers ::= (name, left.size)
      // disciplined caller: free the results handed back to us, then
      // verify residency is back at the pre-query set
      left.foreach(id => post(id).unpersist(blocking = true))
      val residual = sc.getPersistentRDDs.keySet -- pre
      require(residual.isEmpty,
        s"$name: ${residual.size} blocks survived caller unpersist")
      val h = heapMb()
      if (h > peakHeap) peakHeap = h
      println(f"[soak] $name%-28s heap=${h}%5d MB left_behind=${left.size}")
    }
    val total = (System.nanoTime() - t0) / 1e9
    val finalResident = sc.getPersistentRDDs.size
    val lv = leavers.reverse.map { case (n, k) => s""""$n":$k""" }
      .mkString(",")
    val er = errors.reverse.map(e => s""""$e"""").mkString(",")
    println(f"""{"metric":"soak","sf":"$sfDir","cpus":$cpus,""" +
      s""""heap_max_mb":${rt.maxMemory() / (1024 * 1024)},""" +
      s""""n_queries":${SparkEntry.queries.size},""" +
      f""""total_sec":$total%.1f,"peak_heap_mb":$peakHeap,""" +
      s""""final_heap_mb":${heapMb()},""" +
      s""""final_resident_rdds":$finalResident,""" +
      s""""errors":[$er],"left_behind":{$lv}}""")
    spark.stop()
  }
}
