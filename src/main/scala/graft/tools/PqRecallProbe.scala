package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sim.{PqOps, SimOps}

/** Measure PQ-ANN top-1 recall vs the exact twin across `refine`
  * values at a given scale factor: `runMain graft.tools.PqRecallProbe
  * <sfDir> [refine,refine,...]`.
  *
  * Why this exists: recall at a FIXED ADC-shortlist size necessarily
  * decays as the corpus grows (16 candidates against 600k vectors is a
  * 10x smaller shortlist fraction than against 60k) — `refine` is the
  * knob a deployment scales with corpus size. The q_ann_pq oracle pins
  * recall >= 0.75 at refine=16 in its calibrated sf0.001-0.1 regime;
  * this probe documents the refine needed to restore that bound at
  * larger sf (BASELINE.md "sf1 scale validation"). */
object PqRecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val refines = (if (args.length > 1) args(1) else "16,32,64,128")
      .split(",").map(_.trim.toInt).toSeq
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val sub = emb.filter(col("id") < 500)
    val n = emb.count()
    val cb = PqOps.trainPq(emb, m = 16, ksub = 32)
    val codes = PqOps.pqEncode(emb, cb).persist()
    val exact = SimOps.cosineTopK(sub, emb, 1)
      .select(col("qid"), col("cos").as("ecos")).persist()
    exact.count()
    for (refine <- refines) {
      val ann = PqOps.pqCosineTopK(sub, codes, cb, 1, refine = refine,
          rerank = Some(emb))
        .select(col("qid"), col("cos").as("acos"))
      val r = exact.join(ann, Seq("qid"), "left")
        .agg(avg((col("acos") >= col("ecos") - 1e-9).cast("int"))
          .as("recall"))
        .head.getDouble(0)
      println(f"[pqprobe] sf=$sfDir corpus=$n refine=$refine " +
        f"recall=$r%.4f")
    }
    codes.unpersist(); exact.unpersist()
    spark.stop()
  }
}
