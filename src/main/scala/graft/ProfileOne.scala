package graft

import scala.collection.mutable
import org.apache.spark.scheduler._

/** Per-query forensics: runs named SparkEntry queries once (after the
  * usual warmup) with a listener that attributes wall-clock to Spark
  * jobs (count, submission time, duration, description) and reports
  * the gap between total query wall and in-job time (= driver-side
  * planning/codegen/collect work). Dev measurement tool for the
  * optimization rounds — never invoked by the driver.
  *
  * Usage: runMain graft.ProfileOne <sfDir> <q1> [q2 ...]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()

    case class JobRec(id: Int, desc: String, start: Long,
                      var end: Long = 0L, var stages: Int = 0,
                      var tasks: Int = 0)
    val jobs = mutable.ArrayBuffer[JobRec]()
    val byId = mutable.Map[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty(
              "spark.job.description"))).getOrElse("")
          val r = JobRec(e.jobId, d, e.time, stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum)
          jobs += r; byId(e.jobId) = r
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { byId.get(e.jobId).foreach(_.end = e.time) }
    }
    spark.sparkContext.addSparkListener(listener)

    // codegen compile-time attribution: Janino compilation cost shows
    // up as driver gap between jobs; the Codahale histogram in
    // CodegenMetrics accumulates per-compilation millis
    def codegenMs(): Long = {
      val h = org.apache.spark.metrics.source.CodegenMetrics
        .METRIC_COMPILATION_TIME
      h.getCount * math.round(h.getSnapshot.getMean)
    }

    names.foreach { n =>
      SparkEntry.queries.get(n) match {
        case None => println(s"[profile] unknown query $n")
        case Some(fn) =>
          // hygiene identical to Bench.timedRun
          spark.catalog.clearCache()
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = true))
          System.gc()
          jobs.synchronized { jobs.clear(); byId.clear() }
          val cg0 = codegenMs()
          val t0 = System.nanoTime()
          val df = try Some(fn(spark, sfDir))
            catch { case t: Throwable =>
              println(s"[profile] $n CONSTRUCT FAILED: $t"); None }
          val tBuilt = System.nanoTime()
          val rows = try df.map(_.count()).getOrElse(-1L)
            catch { case t: Throwable =>
              println(s"[profile] $n FAILED: $t"); -1L }
          val wall = (System.nanoTime() - t0) / 1e9
          val build = (tBuilt - t0) / 1e9
          val cgMs = codegenMs() - cg0
          // listener bus is async; give it a beat to drain
          Thread.sleep(300)
          val js = jobs.synchronized { jobs.toSeq }
          val inJob = js.map(j =>
            if (j.end > 0) (j.end - j.start) / 1e3 else 0.0).sum
          println(f"[profile] $n wall=$wall%.3f s rows=$rows " +
            f"jobs=${js.size} injob=$inJob%.3f s " +
            f"gap=${wall - inJob}%.3f s build=$build%.3f s " +
            f"codegen=${cgMs / 1e3}%.3f s")
          js.foreach { j =>
            val dur = if (j.end > 0) (j.end - j.start) / 1e3 else -1.0
            val rel = (j.start - (System.currentTimeMillis() -
              (System.nanoTime() - t0) / 1e6)) / 1e3
            println(f"[profile]   job ${j.id}%3d +$rel%6.2fs " +
              f"dur=$dur%7.3f s stages=${j.stages}%2d " +
              f"tasks=${j.tasks}%4d ${j.desc.take(80)}")
          }
      }
    }
    spark.stop()
  }
}
