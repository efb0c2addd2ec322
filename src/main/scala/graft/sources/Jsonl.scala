package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL corpus IO — the interchange format most raw text corpora
  * arrive in. The reader enforces a STRICT caller schema and routes
  * every malformed line into `_corrupt_record` instead of silently
  * dropping it (PERMISSIVE mode), so ingest jobs can count, quarantine
  * and audit bad lines — the production contract a 100 TB crawl feed
  * needs. Scale shape: Spark's native JSON source — splittable line
  * format, predicate/column pruning intact, no UDFs. */
object Jsonl {

  val corruptCol = "_corrupt_record"

  /** Read a JSONL path with `schema` + corrupt-line routing: rows that
    * fail to parse come back with every schema field null and the raw
    * line in `_corrupt_record`. */
  def readJsonl(spark: SparkSession, path: String,
                schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(corruptCol),
      s"readJsonl: schema must not already contain $corruptCol")
    spark.read
      .schema(schema.add(corruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .json(path)
  }

  /** Write a frame as JSONL (one JSON object per line). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
