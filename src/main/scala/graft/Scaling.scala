package graft

/** Scaling-curve probe: times a flagship query set across the sf0.001 /
  * sf0.01 / sf0.1 fixtures in one warm session (best of `reps`), to
  * document how operator cost grows with data size — the evidence that
  * per-query wall-clock is dominated by fixed scheduling/codegen cost
  * at small SF and grows sub-linearly toward the data-bound regime.
  *
  * Usage: runMain graft.Scaling [reps] [q1 q2 ...]
  */
object Scaling {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q_roc_auc", "q_lin_reg_report", "q_knn_join",
        "q_jaccard_dup_pairs", "q_dup_clusters", "q_cosine_topk",
        "q_tfidf", "q_clean_corpus", "q_topk_group", "q_bucket_join",
        "q_sessionize", "q_rolling_lr2", "q_hc_se", "q_multi_target",
        "q_minhash_dup", "q_semantic_dedup", "q_semantic_cells",
        "q_webp_decode", "q_video_frames", "q_url_dedup",
        "q_warc_gz", "q_bpe_tokens", "q_image_dhash",
        "q_epoch_shuffle",
        // round-8 curation family
        "q_gopher_rules", "q_c4_rules", "q_dsir", "q_mojibake",
        "q_incremental_dedup", "q_sentence_dedup", "q_text_chunks",
        "q_curation_report", "q_ppl_buckets", "q_hash_split",
        // round-9 additions
        "q_lm_kn", "q_bradley_terry", "q_jl_ann", "q_pdf_objstm")
    // Optional extra rung past the driver fixtures — e.g.
    // SPARK_GRAFT_EXTRA_SF="1=/root/repo/target/sf1" (MakeScale
    // output) extends every curve to 1000x the smallest fixture.
    val extra = sys.env.get("SPARK_GRAFT_EXTRA_SF")
      .map(_.split("=", 2)).map(a => (a(0), a(1))).toSeq
    val sfs = Seq("0.001", "0.01", "0.1")
      .map(sf => (sf, s"/root/testdata/sf$sf")) ++ extra
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val results = for (n <- names) yield {
      val times = for ((_, dir) <- sfs) yield {
        val fn = SparkEntry.queries(n)
        val best = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          fn(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }.min
        best
      }
      println(f"[scaling] ${n}%-22s " +
        times.zip(sfs).map { case (t, (sf, _)) => f"sf$sf=${t}%.2fs" }
          .mkString("  "))
      (n, times)
    }
    val span = math.pow(10, sfs.length.toDouble - 1).toLong
    results.foreach { case (n, ts) =>
      println(f"[scaling-ratio] ${n}%-22s x${ts.last / ts.head}%.1f " +
        s"over ${span}x data")
    }
    spark.stop()
  }
}
