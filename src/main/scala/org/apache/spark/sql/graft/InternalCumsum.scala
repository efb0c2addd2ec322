package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.types._

/** Per-physical-partition inclusive running sums over InternalRows —
  * the kernel of [[graft.util.GlobalCumsum]].
  *
  * Lives in the spark.sql.graft bridge package for
  * `internalCreateDataFrame`: the external-Row formulation
  * (`df.rdd.mapPartitions` + `createDataFrame`) deserializes and
  * re-serializes every row through boxed objects and a RowEncoder —
  * measured 2× on a 700k-row rank table (r17, q_corr_table). This path
  * reads primitives straight from the UnsafeRows the scan produces and
  * appends the accumulator columns via JoinedRow, zero boxing, zero
  * exchanges.
  *
  * Semantics match `sum(...) over (rows unboundedPreceding..current)`
  * per physical partition in iterator order: int/long accumulate to
  * Long, float/double to Double, nulls are skipped, and the output is
  * null until the first non-null input. The input must already be
  * partition-locally ordered (GlobalCumsum sorts within partitions
  * first).
  */
object InternalCumsum {

  /** Append `outNames(i)` = running sum of `sumCols(i)` to `df`,
    * computed independently inside each physical partition. */
  def perPartition(df: DataFrame, sumCols: Seq[String],
                   outNames: Seq[String]): DataFrame = {
    require(sumCols.length == outNames.length)
    val spark = df.sparkSession
    val inSchema = df.schema
    val sIdx = sumCols.map(inSchema.fieldIndex).toArray
    // 0 = accumulate Long (int/long), 1 = accumulate Double
    // (float/double) — the same promotions window Sum applies
    val kinds: Array[Int] = sIdx.map { i =>
      inSchema.fields(i).dataType match {
        case IntegerType | LongType => 0
        case FloatType | DoubleType => 1
        case dt => throw new IllegalArgumentException(
          "InternalCumsum: unsupported sum column type " + dt +
            " (supported: int, long, float, double)")
      }
    }
    val widths: Array[Int] = sIdx.map { i =>
      inSchema.fields(i).dataType match {
        case IntegerType => 0
        case LongType => 1
        case FloatType => 2
        case DoubleType => 3
      }
    }
    val outSchema = StructType(inSchema.fields ++
      outNames.zipWithIndex.map { case (n, i) =>
        StructField(n, if (kinds(i) == 0) LongType else DoubleType)
      })
    val nS = sIdx.length
    val rdd = df.queryExecution.toRdd.mapPartitions { it =>
      val accL = new Array[Long](nS)
      val accD = new Array[Double](nS)
      val seen = new Array[Boolean](nS)
      it.map { r =>
        val extra = new GenericInternalRow(nS)
        var i = 0
        while (i < nS) {
          val ci = sIdx(i)
          if (!r.isNullAt(ci)) {
            seen(i) = true
            widths(i) match {
              case 0 => accL(i) += r.getInt(ci)
              case 1 => accL(i) += r.getLong(ci)
              case 2 => accD(i) += r.getFloat(ci)
              case 3 => accD(i) += r.getDouble(ci)
            }
          }
          if (!seen(i)) extra.setNullAt(i)
          else if (kinds(i) == 0) extra.setLong(i, accL(i))
          else extra.setDouble(i, accD(i))
          i += 1
        }
        // copy(): the scan reuses its UnsafeRow buffer across rows
        new JoinedRow(r.copy(), extra): InternalRow
      }
    }
    // Spark 4: the InternalRow factory lives on the classic session
    // implementation (private[sql] — reachable from this bridge pkg)
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, outSchema)
  }
}
