package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-twin fixture generator (r10 verdict ask #1): writes TWO
  * same-sized corpora under `<outRoot>/uniform` and `<outRoot>/skew`
  * that differ ONLY in key distribution, so a query's skew/uniform
  * time ratio isolates the engine's skew handling from data volume.
  * Production web corpora are Zipfian in host/domain/bucket — every
  * dedup/band/mixing operator was previously validated on uniform
  * synthetic data only; this is the fixture that closes that axis.
  *
  * Skew axes (all deterministic, hash-driven — replayable):
  *   - documents: the hot domain `src0` absorbs ~30% of docs and the
  *     rest follow a 1/k Zipf tail over src1..src19 (vs the source
  *     data's uniform 20-way split); additionally ~1% of docs become a
  *     HOT NEAR-DUP FAMILY (shared boilerplate + per-doc variant
  *     token, all in the hot domain) — one giant MinHash band bucket,
  *     one giant jaccard candidate block, one giant CC component.
  *   - events: ~30% of rows remapped to one hot user_id (0).
  *   - lineitem: ~20% of rows remapped to one hot URGENT order key
  *     (the bloom/AQE-skew-join stress).
  *   - orders: ~20% of rows remapped to one hot customer key (the
  *     bucketed-join stress).
  *
  * Volume: documents and events replicate `factor`× first (MakeScale
  * salt semantics — token bijection per copy preserves within-copy
  * similarity structure; events shift time per copy), lineitem
  * replicates `factor`× at CONSTANT key domain (each order gets
  * factor× more lines — join multiplicity scales without new keys, so
  * uniform and skew twins differ only in which key each row carries).
  * orders/customer and the dims pass through.
  *
  * Usage: runMain graft.MakeSkew <srcDir> <outRoot> <factor>
  */
object MakeSkew {
  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: MakeSkew <srcDir> <outRoot> <factor>")
    val spark = GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, args(0), args(1), args(2).toInt)
    spark.stop()
  }

  /** Programmatic entry (MakeSkewSpec) — does not stop the session. */
  def run(spark: SparkSession, src: String, outRoot: String,
          factor: Int): Unit = {
    require(factor >= 1 && factor <= 100,
      s"factor must be in [1, 100], got $factor")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, twin: String, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outRoot/$twin/$name.parquet")
      println(s"[makeskew] $twin/$name: " +
        spark.read.parquet(s"$outRoot/$twin/$name.parquet").count() +
        " rows")
    }
    def rep(df: DataFrame): DataFrame =
      df.withColumn("__c", explode(sequence(lit(0L), lit(factor - 1L))))

    // ---- documents: factor× token-salted copies, then per-twin keys
    val docs0 = rep(tbl("documents"))
    val docMax = tbl("documents").agg(max(col("doc_id"))).head.getLong(0) + 1L
    val saltedText = when(col("__c") === 0L, col("text"))
      .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
        concat(lit("$1"), lit("_"), col("__c"))))
    val base = docs0.select(
      (col("doc_id") + col("__c") * docMax).as("doc_id"),
      saltedText.as("text"), col("lang"), col("source"))

    // uniform twin: source distribution untouched (20-way uniform)
    write(base.withColumn("n_chars", length(col("text")).cast("long")),
      "uniform", "documents")

    // skew twin: Zipf domains + hot near-dup family
    val zb = pmod(xxhash64(col("doc_id"), lit("zipf")), lit(1000L))
    // src0 gets 30%; src1..src19 share the rest ∝ 1/k
    val harm = (1 to 19).map(1.0 / _).sum
    val cuts = (1 to 19).scanLeft(300.0) { (acc, k) =>
      acc + 700.0 * (1.0 / k) / harm
    }.tail // 19 cumulative upper bounds ending at 1000
    val zipfSource = (1 to 19).foldLeft(
      when(zb < 300L, lit("src0"))) { (w, k) =>
      w.when(zb < math.round(cuts(k - 1)), lit(s"src$k"))
    }.otherwise(lit("src19"))
    val hotFam = pmod(xxhash64(col("doc_id"), lit("fam")), lit(100L)) === 0L
    val boiler = (1 to 60).map(i => s"boil$i").mkString(" ")
    val famText = concat(lit(boiler + " tail"),
      pmod(col("doc_id"), lit(7L)).cast("string"))
    val skewDocs = base
      .withColumn("source", when(hotFam, lit("src0")).otherwise(zipfSource))
      .withColumn("text", when(hotFam, famText).otherwise(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(skewDocs, "skew", "documents")

    // ---- events: factor× copies (time shift + fresh users), then skew
    val ev0 = rep(tbl("events"))
    val evMax = tbl("events").agg(max(col("event_id"))).head.getLong(0) + 1L
    val userMax = tbl("events").agg(max(col("user_id"))).head.getLong(0) + 1L
    val evBase = ev0.select(
      (col("event_id") + col("__c") * evMax).as("event_id"),
      (col("ts") + make_dt_interval(col("__c") * 7)).as("ts"),
      (col("user_id") + col("__c") * userMax).as("user_id"),
      col("event_type"), col("value"), col("props"))
    write(evBase, "uniform", "events")
    val hotEv = pmod(xxhash64(col("event_id"), lit("hu")), lit(100L)) < 30L
    write(evBase.withColumn("user_id",
      when(hotEv, lit(0L)).otherwise(col("user_id"))), "skew", "events")

    // ---- lineitem: factor× at constant key domain, then hot order key
    val li0 = rep(tbl("lineitem"))
    val liBase = li0.select(col("l_orderkey"), col("l_partkey"),
      col("l_suppkey"),
      (col("l_linenumber") + col("__c") * 10L).as("l_linenumber"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"),
      col("l_tax"), col("l_returnflag"), col("l_linestatus"),
      col("l_shipdate"))
    write(liBase, "uniform", "lineitem")
    val hotOrderRow = tbl("orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .agg(min(col("o_orderkey"))).head
    require(!hotOrderRow.isNullAt(0),
      "MakeSkew: the source orders table has no 1-URGENT rows to pick " +
        "the hot order key from — point --src at a TPC-H-shaped fixture")
    val hotOrder = hotOrderRow.getLong(0)
    val hotLi = pmod(xxhash64(col("l_orderkey"), col("l_linenumber")),
      lit(100L)) < 20L
    write(liBase.withColumn("l_orderkey",
        when(hotLi, lit(hotOrder)).otherwise(col("l_orderkey"))),
      "skew", "lineitem")

    // ---- orders: pass-through, then hot customer key
    val ord = tbl("orders")
    write(ord, "uniform", "orders")
    val hotCust = tbl("customer").agg(min(col("c_custkey"))).head.getLong(0)
    val hotOrd = pmod(xxhash64(col("o_orderkey"), lit("hc")),
      lit(100L)) < 20L
    write(ord.withColumn("o_custkey",
        when(hotOrd, lit(hotCust)).otherwise(col("o_custkey"))),
      "skew", "orders")

    // ---- identical pass-throughs for both twins
    Seq("customer", "supplier", "part", "nation", "region",
        "embeddings").foreach { t =>
      val d = tbl(t)
      write(d, "uniform", t); write(d, "skew", t)
    }
  }
}
