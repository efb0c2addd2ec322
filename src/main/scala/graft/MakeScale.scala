package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up fixture generator: replicate an existing sf directory
  * `factor`× with foreign-key-preserving key offsets, so the bench and
  * the Scaling probes can be measured one notch past the largest
  * driver-provided fixture (r7 verdict ask #2 — every plan was argued
  * scale-safe but none measured past 600k lineitem rows).
  *
  * Per copy c in [0, factor): every key column is offset by
  * c × (max_key + 1) of its domain, so joins fan out exactly like the
  * source (each copy is a disjoint, internally-consistent universe
  * over the SHARED region/nation dims — dims stay fixed, as they do in
  * a real warehouse).
  *
  * Similarity-bearing tables are replicated DISTRIBUTION-PRESERVING
  * (mode "salt", the default): `documents` copies salt every token
  * with the copy index (a token bijection — every within-copy
  * similarity relationship, dup family, and length distribution is
  * preserved exactly, while cross-copy Jaccard drops to ~0), and
  * `embeddings` copies apply a per-copy deterministic SIGN-FLIP
  * pattern (norms and within-copy angles exactly preserved, cross-copy
  * cosines scrambled). This scales data VOLUME at a fixed similarity
  * distribution — the engine-scaling measurement. Mode "neardup"
  * instead appends a two-token suffix / perturbs one component, making
  * every copy a near-duplicate of its original: cluster SIZES grow
  * `factor`×, so pair-enumeration outputs grow quadratically — a
  * duplication-heavy stress profile, useful to observe but NOT a pure
  * engine-scaling measurement. `events` copies shift time by c×7 days
  * with fresh user ids, extending the timeline at the same per-user
  * density.
  *
  * Usage: runMain graft.MakeScale <srcDir> <outDir> <factor> [mode]
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: MakeScale <srcDir> <outDir> <factor> [salt|neardup]")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    val mode = if (args.length == 4) args(3) else "salt"
    require(mode == "salt" || mode == "neardup",
      s"mode must be salt or neardup, got $mode")
    require(factor >= 2 && factor <= 1000,
      s"factor must be in [2, 1000], got $factor")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rep(df: DataFrame): DataFrame =
      df.withColumn("__c",
        explode(sequence(lit(0L), lit(factor - 1L))))
    def off(df: DataFrame, c: String): org.apache.spark.sql.Column = {
      val m = df.agg(max(col(c))).head.getLong(0) + 1L
      (col(c) + col("__c") * m).as(c)
    }
    def write(df: DataFrame, name: String): Unit = {
      // 16 part files regardless of size (r15): DuckDB 1.0
      // parallelizes a parquet scan by row group, and a
      // single-part-file fixture pins every oracle pipeline rooted at
      // that scan to ONE thread — the q_dup_clusters sf1 replay spent
      // ~55 s in a 1-thread join+aggregate that runs in ~6 s once the
      // scan has 16 morsels. Same data, same semantics (row order is
      // irrelevant on both sides: the gate sorts rows, Spark plans
      // are order-free); Spark-side reads split by
      // files.maxPartitionBytes either way.
      df.repartition(16).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")
      println(s"[makescale] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    // dims pass through untouched
    Seq("region", "nation").foreach(t => write(tbl(t), t))

    val cust = rep(tbl("customer"))
    write(cust.select(off(cust, "c_custkey"), col("c_name"),
      col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer")

    val supp = rep(tbl("supplier"))
    write(supp.select(off(supp, "s_suppkey"), col("s_name"),
      col("s_nationkey"), col("s_acctbal")), "supplier")

    val part = rep(tbl("part"))
    write(part.select(off(part, "p_partkey"), col("p_name"),
      col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice")), "part")

    val ord = rep(tbl("orders"))
    val custMax = tbl("customer").agg(max(col("c_custkey"))).head.getLong(0) + 1L
    write(ord.select(off(ord, "o_orderkey"),
      (col("o_custkey") + col("__c") * custMax).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority")), "orders")

    val li = rep(tbl("lineitem"))
    val ordMax = tbl("orders").agg(max(col("o_orderkey"))).head.getLong(0) + 1L
    val partMax = tbl("part").agg(max(col("p_partkey"))).head.getLong(0) + 1L
    val suppMax = tbl("supplier").agg(max(col("s_suppkey"))).head.getLong(0) + 1L
    write(li.select(
      (col("l_orderkey") + col("__c") * ordMax).as("l_orderkey"),
      (col("l_partkey") + col("__c") * partMax).as("l_partkey"),
      (col("l_suppkey") + col("__c") * suppMax).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate")), "lineitem")

    val ev = rep(tbl("events"))
    val userMax = tbl("events").agg(max(col("user_id"))).head.getLong(0) + 1L
    write(ev.select(off(ev, "event_id"),
      (col("ts") + make_dt_interval(col("__c") * 7)).as("ts"),
      (col("user_id") + col("__c") * userMax).as("user_id"),
      col("event_type"), col("value"), col("props")), "events")

    val docs = rep(tbl("documents"))
    // copy 0 keeps the source text verbatim; copies 1+ transform per
    // the selected mode (distribution-preserving token salt, or
    // near-dup two-token suffix)
    val newText =
      if (mode == "salt")
        when(col("__c") === 0L, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1"), lit("_"), col("__c"))))
      else
        when(col("__c") === 0L, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("__c"),
            lit(" v"), pmod(col("doc_id"), lit(97L))))
    write(docs.select(off(docs, "doc_id"), newText.as("text"),
      col("lang"), col("source"),
      length(newText).cast("long").as("n_chars")), "documents")

    val emb = rep(tbl("embeddings"))
    val newVec =
      if (mode == "salt")
        // deterministic per-copy sign-flip pattern: norms and
        // within-copy angles preserved exactly, cross-copy scrambled
        when(col("__c") === 0L, col("embedding"))
          .otherwise(zip_with(col("embedding"),
            sequence(lit(1), size(col("embedding"))),
            (x, i) => when(
              pmod(xxhash64(concat_ws("_", i.cast("string"),
                col("__c").cast("string"))), lit(2L)) === 0L,
              -x).otherwise(x).cast("float")))
      else
        // near-dup clusters: perturb component 1 by c*1e-3
        concat(
          array((col("embedding")(0) +
            col("__c").cast("float") * lit(0.001f)).cast("float")),
          slice(col("embedding"), 2, 1000000))
    write(emb.select(off(emb, "vec_id"), newVec.as("embedding"),
      col("label")), "embeddings")

    spark.stop()
  }
}
