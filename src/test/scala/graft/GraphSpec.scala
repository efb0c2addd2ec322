package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.GraphOps
import graft.ops.ScaleOps

class GraphSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  /** Local union-find oracle. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // normalize: component = min id (union by min keeps roots minimal)
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccMap(edges: Seq[(Long, Long)],
                    localThreshold: Long): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    GraphOps.connectedComponents(df, col("a"), col("b"),
        localFinishThreshold = localThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // threshold 0 forces the distributed star rounds; the default covers
  // the driver-side union-find finish — both must agree with the oracle
  for ((mode, thr) <- Seq("distributed" -> 0L, "local-finish" -> 2000000L)) {
    test(s"connectedComponents ($mode) on chain, star, cliques, 2-cycle") {
      // one long chain (worst case for label propagation, fine for
      // star-contraction), a star, two separate cliques, a 2-cycle
      val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
      val star = (101L to 110L).map(v => (100L, v))
      val cliqueA = for (i <- 200L to 205L; j <- (i + 1) to 205L)
        yield (i, j)
      val twoCycle = Seq((300L, 301L), (301L, 300L), (302L, 302L))
      val edges = chain ++ star ++ cliqueA ++ twoCycle
      val got = ccMap(edges, thr)
      val want = ufComponents(edges.filter(e => e._1 != e._2))
      assert(got == want)
      assert(got(39L) == 0L && got(110L) == 100L && got(205L) == 200L)
      assert(got(301L) == 300L)
      assert(!got.contains(302L)) // pure self-loop node drops out
    }

    test(s"connectedComponents ($mode) matches union-find, random graph") {
      val rnd = new scala.util.Random(7)
      val edges = Seq.fill(400)((rnd.nextInt(150).toLong,
        rnd.nextInt(150).toLong)).filter(e => e._1 != e._2)
      assert(ccMap(edges, thr) == ufComponents(edges))
    }
  }

  test("dupClusters sizes and dedupByClusters survivorship") {
    import spark.implicits._
    // components {1,2,3}, {10,11}, isolated doc 99 (no pairs)
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val clusters = GraphOps.dupClusters(pairs, col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(clusters.toSet ==
      Set((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
        (10L, 10L, 2L), (11L, 10L, 2L)))
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val kept = GraphOps.dedupByClusters(docs, col("doc_id"), pairs,
      col("id1"), col("id2")).collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 10L, 99L))
  }

  test("dedupByClustersKeepBest keeps the max-score row per cluster, " +
      "ties to the lowest id, pass-through for unclustered rows (r15)") {
    import spark.implicits._
    // clusters {1,2,3} and {10,11}; isolated 99.
    // scores: cluster 1: doc 2 wins (score 9); cluster 2: tie 5/5 →
    // lowest id 10 wins; 99 passes through.
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val docs = Seq((1L, 4L), (2L, 9L), (3L, 7L), (10L, 5L), (11L, 5L),
      (99L, 1L)).toDF("doc_id", "score")
    val kept = GraphOps.dedupByClustersKeepBest(docs, col("doc_id"),
        pairs, col("id1"), col("id2"), col("score"))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 10L, 99L))
    // min-id policy twin on the same frame, for contrast: the two
    // policies agree only where min-id == argmax-score
    val minId = GraphOps.dedupByClusters(docs, col("doc_id"), pairs,
      col("id1"), col("id2")).collect().map(_.getLong(0)).toSet
    assert(minId == Set(1L, 10L, 99L))
  }

  test("dedupByClusters with a corpus-scale loser fraction: correct " +
      "survivors, no forced-broadcast hint in the plan") {
    import spark.implicits._
    // one giant chain cluster covering 90% of the corpus — the loser
    // set is 8999/10000 of the documents, the regime where a forced
    // broadcast(losers) would ship nearly the whole corpus to every
    // executor. Strategy must be left to AQE.
    val n = 10000L
    val pairs = spark.range(1, n - 1000)
      .select(col("id").as("id1"), (col("id") + 1).as("id2"))
    val docs = spark.range(1, n + 1).toDF("doc_id")
    val kept = GraphOps.dedupByClusters(docs, col("doc_id"), pairs,
      col("id1"), col("id2"))
    // survivors: cluster representative 1 + the 1000 unclustered tail
    assert(kept.count() == 1001L)
    assert(kept.agg(min(col("doc_id"))).head().getLong(0) == 1L)
    // the logical plan must carry no user hint — broadcast-vs-shuffle
    // is AQE's call, sized at runtime
    val logical = kept.queryExecution.analyzed.toString
    assert(!logical.contains("UnresolvedHint") &&
      !logical.contains("ResolvedHint"),
      s"dedupByClusters must not force a join strategy:\n$logical")
  }

  test("localSpanningForest preserves connectivity and shrinks cliques") {
    import spark.implicits._
    // a 30-clique (435 pairs), a chain, and a 2-pair component, spread
    // over few partitions so per-partition forests must re-merge
    val clique = for (i <- 0L until 30L; j <- i + 1 until 30L)
      yield (i, j)
    val chain = (100L until 120L).map(i => (i, i + 1))
    val rest = Seq((500L, 501L), (501L, 502L))
    val edges = (clique ++ chain ++ rest).toDF("u", "v").repartition(3)
    val forest = GraphOps.localSpanningForest(edges, col("u"), col("v"))
    val fRows = forest.collect().map(r => (r.getLong(0), r.getLong(1)))
    // contraction: ≤ (#nodes − #components) edges per partition, so the
    // 435-pair clique collapses to at most 3·29 forest edges
    assert(fRows.length <= (30 - 1) * 3 + chain.length + rest.length)
    // connectivity preserved exactly: CC over forest == CC over raw
    val expected = ufComponents(clique ++ chain ++ rest)
    val got = GraphOps.connectedComponents(forest.toDF("a", "b"),
        col("a"), col("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("localSpanningForest drops self-pairs exactly as the " +
      "uncontracted path's canon filter does") {
    import spark.implicits._
    // adversarial caller-supplied pair frame: self-pairs everywhere,
    // one node (99) whose ONLY edge is a self-pair
    val pairs = Seq((1L, 1L), (1L, 2L), (2L, 2L), (3L, 4L), (99L, 99L))
      .toDF("u", "v").repartition(2)
    val viaForest = GraphOps.dupClusters(pairs, col("u"), col("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val direct = GraphOps.connectedComponents(pairs, col("u"), col("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node 99 surfaces in NEITHER path (canon filters u == v)
    assert(!direct.contains(99L))
    assert(!viaForest.exists(_._1 == 99L))
    assert(viaForest.map(t => t._1 -> t._2).toMap == direct)
  }

  test("localSpanningForest per-task distinct-id cap fails loud with " +
      "the remedy, not an executor OOM") {
    import spark.implicits._
    val prev = System.getProperty("graft.maxForestIds")
    System.setProperty("graft.maxForestIds", "10")
    try {
      val pairs = (0L until 40L).map(i => (i, i + 1000L))
        .toDF("u", "v").coalesce(1)
      val ex = intercept[org.apache.spark.SparkException] {
        GraphOps.localSpanningForest(pairs, col("u"), col("v")).count()
      }
      val msg = ex.getMessage + Option(ex.getCause)
        .map(_.getMessage).getOrElse("")
      assert(msg.contains("graft.maxForestIds"),
        s"cap error must name the property: $msg")
    } finally {
      if (prev == null) System.clearProperty("graft.maxForestIds")
      else System.setProperty("graft.maxForestIds", prev)
    }
  }

  test("dupClustersFromJaccard equals the unfused pairs-then-clusters") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 400)
    import graft.text.TextOps
    val pairs = TextOps.jaccardDupPairs(docs, col("doc_id"), col("text"),
      col("source"), 0.5)
    val unfused = GraphOps.dupClusters(pairs, col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fused = GraphOps.dupClustersFromJaccard(docs, col("doc_id"),
        col("text"), col("source"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(unfused.nonEmpty)
    assert(fused == unfused)
  }

  test("zorderKey interleaves bits and preserves locality blocks") {
    import spark.implicits._
    val df = (for (x <- 0 until 8; y <- 0 until 8) yield (x, y))
      .toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        ScaleOps.zorderKey(Seq(col("x"), col("y")), 3).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    def morton(x: Int, y: Int): Long =
      (0 until 3).map(b => (((x >> b) & 1) << (2 * b)) |
        (((y >> b) & 1) << (2 * b + 1))).sum.toLong
    got.foreach { case ((x, y), z) => assert(z == morton(x, y)) }
    // all 64 keys distinct, and the 4x4 sub-block [0,4)² owns keys 0-15
    assert(got.values.toSet.size == 64)
    assert(got.filter { case ((x, y), _) => x < 4 && y < 4 }
      .values.forall(_ < 16))
  }

  test("bloomPrefilter keeps all matches; join after equals plain join") {
    import spark.implicits._
    val big = (0L until 5000L).map(i => (i, i % 7)).toDF("k", "p")
    val small = (0L until 5000L by 50L).toDF("sk")
    val pre = ScaleOps.bloomPrefilter(big, col("k"), small, col("sk"),
      expectedItems = 200L, fpp = 0.03)
    val preKeys = pre.select("k").collect().map(_.getLong(0)).toSet
    // superset of true matches, subset bounded by fpp slack
    assert((0L until 5000L by 50L).forall(preKeys.contains))
    assert(preKeys.size <= 100 + (0.1 * 5000).toInt)
    val joined = pre.join(small, col("k") === col("sk"))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(joined == (0L until 5000L by 50L).toSet)
  }
}
