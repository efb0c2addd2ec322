package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.ProjectOps

class ProjectSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("jlMatrix: deterministic, standard-normal shaped") {
    val m1 = ProjectOps.jlMatrix(32, 64, salt = 7)
    val m2 = ProjectOps.jlMatrix(32, 64, salt = 7)
    assert(m1.flatten.toSeq == m2.flatten.toSeq)
    assert(ProjectOps.jlMatrix(32, 64, salt = 8).flatten.toSeq !=
      m1.flatten.toSeq)
    val xs = m1.flatten
    val mean = xs.sum / xs.length
    val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum /
      xs.length)
    assert(math.abs(mean) < 0.05, s"mean $mean")
    assert(math.abs(sd - 1.0) < 0.05, s"sd $sd")
  }

  test("jlProject preserves pairwise distances within JL tolerance " +
    "and matches a driver-side reference projection") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val vecs = (0 until 60).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
    val df = vecs.toDF("id", "v")
    val proj = df.select(col("id"),
        ProjectOps.jlProject(col("v"), outDim = 32, inDim = 64,
          salt = 3).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // reference: explicit matrix multiply on the driver
    val m = ProjectOps.jlMatrix(32, 64, salt = 3)
    val scale = 1.0 / math.sqrt(32.0)
    def ref(v: Seq[Double]): Seq[Double] =
      m.toSeq.map(row => row.zip(v).map { case (a, b) => a * b }.sum
        * scale)
    vecs.take(5).foreach { case (id, v) =>
      ref(v).zip(proj(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"id=$id $a vs $b")
      }
    }
    // pairwise distance ratios concentrate near 1
    def d(a: Seq[Double], b: Seq[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val ratios = for {
      i <- 0 until 30; j <- (i + 1) until 30
    } yield d(proj(i.toLong), proj(j.toLong)) /
      d(vecs(i)._2, vecs(j)._2)
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.1, s"mean distance ratio $mean")
    assert(ratios.forall(r => r > 0.5 && r < 1.6),
      s"worst ratios: ${ratios.min} ${ratios.max}")
    // projection plan is pure row-local algebra — no shuffle, no UDF
    val plan = df.select(ProjectOps.jlProject(col("v"), 32, 64, 3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython"), plan)
  }

  test("jlCosineTopK recalls planted near-duplicate twins (the " +
    "separated-neighbor regime the op is for)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 100 background vectors + 20 planted twins: twin(i) = base(i) +
    // small noise, so the true top-1 sits at cos ~0.99 while the
    // background is ~0 — separation >> 1/sqrt(jlDim)
    val base = (0 until 100).map(i =>
      (i.toLong, Seq.fill(64)(rnd.nextGaussian())))
    val twins = (0 until 20).map { i =>
      val v = base(i)._2.map(_ + 0.05 * rnd.nextGaussian())
      (1000L + i, v)
    }
    val corpus = (base ++ twins).toDF("id", "vec")
    val queries = twins.toDF("id", "vec")
    val ann = ProjectOps.jlCosineTopK(queries, corpus, k = 1,
        inDim = 64, jlDim = 16, candFactor = 4, salt = 9)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hit = (0 until 20).count(i => ann(1000L + i) == i.toLong)
    assert(hit >= 19, s"twin recall $hit/20")
    // subset invariant: reported cos are true cosines, never above
    // the exact best
    val exact = graft.sim.SimOps.cosineTopK(queries, corpus, 1)
      .select(col("qid"), col("cos").as("ecos"))
    val sub = ProjectOps.jlCosineTopK(queries, corpus, 1, 64, 16, 4, 9)
      .join(exact, Seq("qid"))
      .filter(col("cos") > col("ecos") + 1e-9).count()
    assert(sub == 0L)
  }
}
