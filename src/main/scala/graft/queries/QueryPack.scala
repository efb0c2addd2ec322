package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of driver-contract queries + their DuckDB oracle SQL.
  * SparkEntry unions all packs. */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  protected def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")
}
