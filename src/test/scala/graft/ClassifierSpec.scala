package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.ClassifierOps

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(tok: String, dim: Int): Int =
    Integer.parseInt(md5hex(tok).substring(0, 2), 16) % dim

  test("hashedFeatures replays the md5-prefix bucket arithmetic") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta beta  Gamma"), (2L, ""),
      (3L, "alpha alpha alpha")).toDF("id", "text")
    val dim = 13
    val out = ClassifierOps.hashedFeatures(df, col("id"), col("text"), dim)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    // row 1: tokens alpha, beta, beta, gamma (lowercased)
    val c1 = Map("alpha" -> 1, "beta" -> 2, "gamma" -> 1)
    for (i <- 0 until dim) {
      val want = c1.collect {
        case (t, n) if bucket(t, dim) == i => n
      }.sum / 4.0
      assert(out(1L).getAs[Double](s"f$i") === want, s"f$i")
    }
    assert(out(1L).getAs[Long]("n_tok") === 4L)
    // empty doc: all-zero features, n_tok 0
    assert(out(2L).getAs[Long]("n_tok") === 0L)
    for (i <- 0 until dim) assert(out(2L).getAs[Double](s"f$i") === 0.0)
    // single repeated token: its bucket carries weight 1.0
    val b3 = bucket("alpha", dim)
    assert(out(3L).getAs[Double](s"f$b3") === 1.0)
  }

  test("classifier separates planted vocabularies and scores sanely") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      if (i % 2 == 0)
        (i.toLong, s"good clean prose sentence number $i", 1.0)
      else
        (i.toLong, s"spam junk garbage tokens row $i", 0.0)
    }
    val df = rows.toDF("id", "text", "y")
    val beta = ClassifierOps.trainQualityClassifier(df, col("id"),
      col("text"), col("y"), dim = 13)
    assert(beta.length === 14)
    val scored = ClassifierOps.scoreQuality(df, col("id"), col("text"),
      beta)
    val agg = scored
      .agg(avg(when(col("y") === 1.0, col("quality_prob"))).as("p1"),
        avg(when(col("y") === 0.0, col("quality_prob"))).as("p0"),
        avg(((col("quality_prob") > 0.5).cast("double") === col("y"))
          .cast("double")).as("acc"))
      .head()
    assert(agg.getDouble(0) > 0.9, s"pos mean ${agg.getDouble(0)}")
    assert(agg.getDouble(1) < 0.1, s"neg mean ${agg.getDouble(1)}")
    assert(agg.getDouble(2) === 1.0, s"accuracy ${agg.getDouble(2)}")
  }

  test("MLE score equations vanish on hard labels") {
    import spark.implicits._
    val rows = (0 until 150).map { i =>
      (i.toLong, s"tok${i % 7} tok${i % 5} filler words here",
        if (i % 3 == 0) 1.0 else 0.0)
    }
    val df = rows.toDF("id", "text", "y")
    val dim = 13
    val beta = ClassifierOps.trainQualityClassifier(df, col("id"),
      col("text"), col("y"), dim)
    val feats = ClassifierOps.hashedFeatures(df, col("id"), col("text"),
      dim)
    val mu = graft.ops.LinRegOps.logisticPredict(
      (0 until dim).map(i => col(s"f$i")), beta)
    // ridge-penalized MLE: score residual = lambda·beta (~1e-5)
    val r = feats.withColumn("mu", mu)
      .agg(sum(col("mu") - col("y")).as("s0"),
        sum(col("f1") * (col("mu") - col("y"))).as("s1"))
      .head()
    assert(math.abs(r.getDouble(0)) < 1e-3, s"bias score ${r.getDouble(0)}")
    assert(math.abs(r.getDouble(1)) < 1e-3, s"f1 score ${r.getDouble(1)}")
  }
}
