package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: makes the UDF-backed graft string kernels
  * callable from `spark.sql(...)` under `graft_*` names, so pure-SQL
  * users (notebooks, JDBC/Thrift, dbt-style tooling) get the same
  * operators as the Column API. Codegen'd native expressions
  * (graft_fingerprint64, graft_simhash64, graft_hamming) register
  * separately via `org.apache.spark.sql.graft.GraftExtensions`; these
  * are the scalar-kernel ones where a UDF is the design (SURVEY §2.8).
  *
  * Null in either argument yields SQL NULL (boxed return types — a
  * raw scala primitive return would make Spark substitute a zero).
  * Idempotent — re-registering rebinds the same functions. */
object SqlFunctions {

  private def nsD(f: (String, String) => Double)
      : (String, String) => java.lang.Double =
    (a, b) => if (a == null || b == null) null else Double.box(f(a, b))
  private def nsI(f: (String, String) => Int)
      : (String, String) => java.lang.Integer =
    (a, b) => if (a == null || b == null) null else Int.box(f(a, b))

  def registerAll(spark: SparkSession): Unit = {
    val u = spark.udf
    u.register("graft_str_jaro", nsD(Strings.jaroSim))
    u.register("graft_str_osa", nsI(Strings.osaDist))
    u.register("graft_str_d_leven", nsI(Strings.damerauDist))
    u.register("graft_str_lcs_substr", nsI(Strings.lcsSubstrLen))
    u.register("graft_str_lcs_subseq", nsI(Strings.lcsSubseqLen))
    ()
  }
}
