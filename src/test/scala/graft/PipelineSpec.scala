package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Blueprint, Pipeline}

class PipelineSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol

  test("impute + scale produce zero-mean unit-var on train") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(3.0), Some(5.0)).toDF("x")
    val out = Blueprint(df)
      .impute(Seq("x"), "mean")   // mean of 1,3,5 = 3
      .scale(Seq("x"), "standard")
      .fitTransform(df)
      .agg(avg("x"), stddev_pop("x")).head
    assert(approx(out.getDouble(0), 0.0))
    // unit POPULATION variance: the reference scales by std(ddof=0)
    assert(approx(out.getDouble(1), 1.0, 1e-9))
  }

  test("one-hot + ordinal follow sorted-distinct order") {
    import spark.implicits._
    val df = Seq("b", "a", "c", "a").toDF("c")
    val out = Blueprint(df)
      .oneHotEncode(Seq("c"))
      .ordinalEncode(Seq("c"))
      .fitTransform(df)
      .orderBy("c_a", "c_b", "c_c")
      .collect()
    // ordinal: a→0, b→1, c→2
    val m = out.map(r => (r.getAs[Int]("c_a"), r.getAs[Int]("c_b"),
      r.getAs[Int]("c_c"), r.getAs[Int]("c")))
    assert(m.contains((1, 0, 0, 0)))
    assert(m.contains((0, 1, 0, 1)))
    assert(m.contains((0, 0, 1, 2)))
  }

  test("JSON round-trip preserves every step type") {
    import spark.implicits._
    val df = Seq((1.0, 2.0), (3.0, 4.0), (10.0, 0.5)).toDF("x", "y")
    val pipe = Blueprint(df)
      .winsorize(Seq("x"), 0.0, 1.0)
      .polynomialFeatures(Seq("x", "y"))
      .filter("y > 0")
      .sort(Seq("x"), desc = true)
      .materialize()
    val json = pipe.toJson
    val pipe2 = Pipeline.fromJson(json)
    assert(pipe2.toJson == json)
    val a = pipe.transform(df).collect().map(_.toSeq)
    val b = pipe2.transform(df).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("explode/rename/groupByAgg steps survive JSON round-trip") {
    import spark.implicits._
    val df = Seq((1, Seq(1.0, 2.0)), (2, Seq(3.0, 4.0, 5.0)))
      .toDF("k", "vs")
    val pipe = Blueprint(df)
      .explodeCol("vs")
      .rename("vs" -> "v")
      .groupByAgg(Seq("k"), Seq("sum(v) as sum_v", "count(*) as n"))
      .materialize()
    val out = Pipeline.fromJson(pipe.toJson).transform(df)
      .orderBy("k").collect()
    assert(out(0).getDouble(1) == 3.0 && out(0).getLong(2) == 2L)
    assert(out(1).getDouble(1) == 12.0 && out(1).getLong(2) == 3L)
  }

  test("selectByStd drops constant columns") {
    import spark.implicits._
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "const")
    val out = Blueprint(df)
      .selectByStd(Seq("x", "const"), 1e-9, 100.0)
      .fitTransform(df)
    assert(out.columns.toSeq == Seq("x"))
  }

  test("schema-driven steps: nanToNull, intToFloat, castBools, ivEncode") {
    import spark.implicits._
    val df = Seq((1, true, Double.NaN, "a", 1.0),
      (2, false, 2.5, "b", 0.0), (3, true, 3.5, "a", 1.0))
      .toDF("i", "b", "x", "c", "y")
    val out = Blueprint(df)
      .nanToNull()
      .intToFloat(f32 = false)
      .castBools()
      .ivEncode("c", "y")
      .fitTransform(df)
    val sch = out.schema.fields.map(f => f.name -> f.dataType.typeName)
      .toMap
    assert(sch("i") == "double") // int → double
    assert(sch("b") == "integer") // bool → int
    val rows = out.orderBy("y", "c").collect()
    assert(rows.exists(_.isNullAt(rows.head.fieldIndex("x")))) // NaN→null
    // iv components: a → (events 2, non 0), b → (0, 1); totals (2, 1)
    val peA = 3.0 / 4; val pnA = 1.0 / 3
    val ivA = (peA - pnA) * math.log(peA / pnA)
    val gotA = out.filter(col("i") === 1.0).select("c").head.getDouble(0)
    assert(approx(gotA, ivA, 1e-12))
  }

  test("encoder fallbacks: ordinal unknown/null, rank-hot defaultRank, " +
      "target-encode default strategies") {
    import spark.implicits._
    import graft.pipeline.EncoderDefault
    val train = Seq(("a", 1.0), ("a", 0.0), ("b", 1.0), ("b", 1.0))
      .toDF("c", "y")
    val test = Seq(Some("a"), Some("zz"), None).toDF("c")
      .withColumn("y", lit(0.0))

    // ordinal_encode(unknown_value=-1, null_value=-2) — transforms.py:371
    val ord = Blueprint(train)
      .ordinalEncode(Seq("c"), unknownValue = Some(-1.0),
        nullValue = Some(-2.0))
      .materialize().transform(test)
      .select("c").collect().map(r => r.getDouble(0))
    assert(ord.toSet == Set(0.0, -1.0, -2.0))

    // rank_hot_encode(default_rank=...) — transforms.py:434: unseen/null
    // get the default rank, so >=b is 1 when defaultRank = 1
    val rh = Blueprint(train)
      .rankHotEncode("c", Seq("a", "b"), "_ge_", Some(1))
      .materialize().transform(test)
      .select("c_ge_b").collect().map(_.getInt(0))
    assert(rh.sorted.toSeq == Seq(0, 1, 1)) // a→0, zz→1, null→1

    // target_encode default: "mean" maps unseen AND null to the train
    // target mean; "zero" to 0; a Value to itself (transforms.py:471)
    val trainMean = 0.75
    val te = Blueprint(train)
      .targetEncode("c", "y", minSamplesLeaf = 2, smoothing = 1.0,
        default = EncoderDefault.Mean)
      .materialize().transform(test)
      .select("c").collect().map(_.getDouble(0))
    assert(te.count(v => approx(v, trainMean)) == 2) // zz and null
    val teZero = Blueprint(train)
      .woeEncode("c", "y", default = EncoderDefault.Zero)
      .materialize().transform(test)
      .select("c").collect().map(_.getDouble(0))
    assert(teZero.count(_ == 0.0) == 2)
    val teVal = Blueprint(train)
      .ivEncode("c", "y", default = EncoderDefault.Value(-9.5))
      .materialize().transform(test)
      .select("c").collect().map(_.getDouble(0))
    assert(teVal.count(_ == -9.5) == 2)
  }

  test("fit statistics come from train, applied to test") {
    import spark.implicits._
    val train = Seq(0.0, 10.0).toDF("x")   // min 0, max 10
    val test = Seq(5.0, 20.0).toDF("x")
    val got = Blueprint(train).scale(Seq("x"), "min_max")
      .materialize().transform(test)
      .collect().map(_.getDouble(0)).sorted
    assert(approx(got(0), 0.5) && approx(got(1), 2.0))
  }

  test("fit encoders fail loud past the cardinality cap") {
    import spark.implicits._
    val df = (0 until 20).map(i => s"v$i").toDF("c")
    sys.props("graft.maxFitCardinality") = "5"
    try {
      val e = intercept[Exception] {
        Blueprint(df).oneHotEncode(Seq("c")).materialize()
      }
      assert(e.getMessage.contains("distinct values"))
      assert(e.getMessage.contains("maxFitCardinality"))
      val e2 = intercept[Exception] {
        Blueprint(df).ordinalEncode(Seq("c")).materialize()
      }
      assert(e2.getMessage.contains("ordinalEncode"))
    } finally sys.props.remove("graft.maxFitCardinality")
    // under the cap the encoder still works
    assert(Blueprint(df).ordinalEncode(Seq("c")).fitTransform(df)
      .agg(max("c")).head.getInt(0) == 19)
  }

  test("batched winsorize->robustScale run is expression-identical to " +
      "fitting each step on the intermediate frame") {
    import spark.implicits._
    // skewed values incl. a negative outlier and duplicates; every
    // quantile method in play (nearest for the clip, midpoint for the
    // scale, polars defaults)
    val xs = Seq(-50.0, 1.0, 2.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0,
      9.0, 10.0, 11.0, 12.0, 200.0)
    val df = xs.toDF("x")
    val batched = Blueprint(df)
      .winsorize(Seq("x"), 0.1, 0.9)
      .robustScale(Seq("x"))
      .materialize()
    // sequential ground truth: fit winsorize alone, transform, then
    // fit robustScale on the RESULT frame — the semantics materialize
    // must preserve while serving both fits from one pass
    val w = Blueprint(df).winsorize(Seq("x"), 0.1, 0.9).materialize()
    val clipped = w.transform(df)
    val r = Blueprint(clipped).robustScale(Seq("x")).materialize()
    val seqJson = Pipeline(w.steps ++ r.steps).toJson
    assert(batched.toJson == seqJson,
      s"batched=${batched.toJson}\nsequential=$seqJson")
    // and a clip bound that actually binds the scale quantile: wide
    // clip at 0.4/0.6 pulls 0.25/0.75 order stats onto the bounds
    val b2 = Blueprint(df).winsorize(Seq("x"), 0.4, 0.6)
      .robustScale(Seq("x")).materialize()
    val w2 = Blueprint(df).winsorize(Seq("x"), 0.4, 0.6).materialize()
    val r2 = Blueprint(w2.transform(df)).robustScale(Seq("x"))
      .materialize()
    assert(b2.toJson == Pipeline(w2.steps ++ r2.steps).toJson)
    // a robustScale FOLLOWED by a quantile fit on the same column must
    // NOT batch (affine maps don't commute bit-exactly): sequential
    // semantics still hold
    val b3 = Blueprint(df).robustScale(Seq("x"))
      .winsorize(Seq("x"), 0.1, 0.9).materialize()
    val rs = Blueprint(df).robustScale(Seq("x")).materialize()
    val w3 = Blueprint(rs.transform(df)).winsorize(Seq("x"), 0.1, 0.9)
      .materialize()
    assert(b3.toJson == Pipeline(rs.steps ++ w3.steps).toJson)
  }
}
