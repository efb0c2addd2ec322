package graft

/** Plan inspector: prints `.explain("formatted")` for the named queries
  * (or a representative default set) so scan pruning / pushdown /
  * broadcast / codegen spans can be reviewed per round.
  *
  * Usage: runMain graft.Explain <sfDir> [q1 q2 ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_lin_reg", "q_roc_auc", "q_knn_kth_dist",
        "q_jaccard_dup_pairs", "q_pipeline")
    val spark = GraftSession.builder("4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries.get(n) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None     => println(s"unknown query $n")
      }
    }
    spark.stop()
  }
}
