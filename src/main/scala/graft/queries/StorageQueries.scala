package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Driver-contract queries for the storage-layout operators (SURVEY
  * §2.1 — the reference inherits Polars IO; Spark-side we own layout):
  * bucketed external tables whose co-bucketed joins run with no
  * Exchange. The oracle is layout-independent (a plain SQL join), so
  * the hash gate proves the bucketed physical path returns exactly the
  * shuffled plan's rows. */
object StorageQueries extends QueryPack {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bucket_join" -> ((s, dir) => {
      // Re-layout both sides bucketed by the join key, then join via
      // the catalog tables: EnsureRequirements sees matching
      // HashPartitioning(o_custkey | c_custkey, 8) on both sides and
      // plans the sort-merge join with zero Exchange (PlanSpec pins
      // this). Paths are keyed by the sf dir so repeat runs overwrite.
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val root = s"${System.getProperty("java.io.tmpdir")}/graft_buckets$tag"
      // the two bucketed writes are independent — overlap them so the
      // second write's tasks back-fill the first's tail (guide §2.6)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fo = Future(Bucketing.writeBucketed(
        t(s, dir, "orders").select("o_custkey", "o_totalprice"),
        s"graft_bo$tag", s"$root/orders", 8, Seq("o_custkey")))
      val fc = Future(Bucketing.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey").as("o_custkey"),
          col("c_mktsegment")),
        s"graft_bc$tag", s"$root/customer", 8, Seq("o_custkey")))
      Await.result(fo, Duration.Inf)
      Await.result(fc, Duration.Inf)
      Bucketing.bucketedJoin(s, s"graft_bo$tag", s"graft_bc$tag",
          Seq("o_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          // decimal-exact sum: o_totalprice is a 2-dp quantity; a
          // double sum's FP error reaches ~1e-5 at sf1 magnitudes
          // (7.5e10), where ROUND(...,2) becomes a coin flip. Summing
          // in DECIMAL(18,2) is exact at ANY sf; both engines then
          // cast the identical decimal to double.
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("total_price"))
        .orderBy("c_mktsegment")
    })
  )

  def oracles: Map[String, String] = Map(
    "q_bucket_join" ->
      """SELECT c_mktsegment,
        |       COUNT(*) AS n_orders,
        |       SUM(o_totalprice::DECIMAL(18,2))::DOUBLE AS total_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
