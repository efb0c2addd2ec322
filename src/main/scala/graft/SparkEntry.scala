package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query packs (one per SURVEY §2 wave) each expose `queries` + matching
  * DuckDB `oracles`; this object unions them. Every query result rounds
  * floating-point outputs and sorts rows on the group key so the Spark
  * and DuckDB sides are bit-comparable despite differing float summation
  * orders.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] = Seq(
    BaseQueries,
    MetricQueries,
    StatQueries,
    TSQueries,
    StringQueries,
    LinRegQueries,
    TextQueries,
    NumQueries,
    KnnQueries,
    PipelineQueries,
    EdaQueries,
    TSQueries2,
    SeqQueries,
    LinearQueries2,
    MiscQueries,
    InfoQueries,
    StreamQueries,
    CoverageQueries,
    GraphQueries,
    StorageQueries,
    SketchQueries,
    CorpusQueries,
    ParityQueries,
    CurationQueries,
    DiagQueries,
    EconQueries,
    DriftQueries,
    ChangeQueries,
    RobustQueries,
    PostHocQueries,
    AssocQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_roc_auc")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
