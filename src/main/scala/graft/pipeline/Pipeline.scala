package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fit/transform pipeline (SURVEY §2.11; reference
  * python/polars_ds/pipeline/pipeline.py Blueprint/Pipeline).
  *
  * Same two-phase architecture as the reference: a [[Blueprint]] records
  * steps; fit steps compute statistics eagerly at `materialize()` (one
  * Spark action per fit step over the train frame) and become literal
  * SQL-expression steps; the resulting [[Pipeline]] is a serializable
  * list of steps whose `transform(df)` folds into ONE Catalyst plan —
  * every withColumns/filter is lazy, so the whole pipeline fuses into a
  * single optimized job regardless of step count (mirrors
  * `_generate_lazy_plan`, pipeline.py:110).
  *
  * Steps carry SQL expression *strings* (the Spark analog of the
  * reference serializing expression trees to JSON, pipeline.py:129-187),
  * which makes JSON round-trip trivial and keeps the transform side
  * 100% whole-stage-codegen.
  */
sealed trait Step {
  def apply(df: DataFrame): DataFrame
}

/** with_columns of named SQL expressions. */
final case class ExprStep(cols: Seq[(String, String)]) extends Step {
  def apply(df: DataFrame): DataFrame =
    df.withColumns(cols.map { case (n, e) => n -> expr(e) }.toMap)
}
/** filter by a SQL predicate. (Blueprint.filter, pipeline.py:337) */
final case class FilterStep(cond: String) extends Step {
  def apply(df: DataFrame): DataFrame = df.filter(expr(cond))
}
/** select a list of SQL expressions. */
final case class SelectStep(exprs: Seq[String]) extends Step {
  def apply(df: DataFrame): DataFrame = df.selectExpr(exprs: _*)
}
final case class DropStep(cols: Seq[String]) extends Step {
  def apply(df: DataFrame): DataFrame = df.drop(cols: _*)
}
final case class SortStep(by: Seq[String], desc: Boolean) extends Step {
  def apply(df: DataFrame): DataFrame =
    df.orderBy(by.map(c => if (desc) col(c).desc else col(c).asc): _*)
}
/** explode an array column in place. (pipeline.py explode step) */
final case class ExplodeStep(column: String) extends Step {
  def apply(df: DataFrame): DataFrame =
    df.withColumn(column, explode(col(column)))
}
/** rename columns. (pipeline.py rename step) */
final case class RenameStep(mapping: Seq[(String, String)]) extends Step {
  def apply(df: DataFrame): DataFrame =
    mapping.foldLeft(df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to) }
}
/** group-by + SQL aggregate expressions.
  * (pipeline.py:930 group_by_agg) */
final case class GroupByAggStep(keys: Seq[String], aggs: Seq[String])
    extends Step {
  def apply(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(expr(aggs.head), aggs.tail.map(expr): _*)
}
/** full SQL over the current frame registered as `df`.
  * (SQLStep, _step.py:98) */
final case class SqlStep(query: String) extends Step {
  def apply(df: DataFrame): DataFrame = {
    // unique per call: identity hashes can collide, and concurrent
    // transforms in one session must not overwrite each other's view
    val name = s"graft_pipeline_df_${SqlStep.viewCounter.incrementAndGet()}"
    df.createOrReplaceTempView(name)
    try df.sparkSession.sql(query.replace("{df}", name))
    finally df.sparkSession.catalog.dropTempView(name) // plan already resolved
  }
}
object SqlStep {
  private val viewCounter = new java.util.concurrent.atomic.AtomicLong(0L)
}

final case class Pipeline(steps: Seq[Step]) {
  def transform(df: DataFrame): DataFrame =
    steps.foldLeft(df)((d, s) => s(d))

  /** JSON round-trip via json4s (ships with Spark). */
  def toJson: String = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods._
    val arr = steps.map {
      case ExprStep(cols) =>
        ("type" -> "expr") ~ ("cols" -> cols.map(c => List(c._1, c._2)))
      case FilterStep(c) => ("type" -> "filter") ~ ("cond" -> c)
      case SelectStep(e) => ("type" -> "select") ~ ("exprs" -> e)
      case DropStep(c)   => ("type" -> "drop") ~ ("cols" -> c)
      case SortStep(b, d) =>
        ("type" -> "sort") ~ ("by" -> b) ~ ("desc" -> d)
      case SqlStep(q)    => ("type" -> "sql") ~ ("query" -> q)
      case ExplodeStep(c) => ("type" -> "explode") ~ ("column" -> c)
      case RenameStep(m) =>
        ("type" -> "rename") ~ ("mapping" -> m.map(p => List(p._1, p._2)))
      case GroupByAggStep(k, a) =>
        ("type" -> "group_by_agg") ~ ("keys" -> k) ~ ("aggs" -> a)
    }
    compact(render(arr))
  }
}

object Pipeline {
  def fromJson(json: String): Pipeline = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods._
    implicit val fmt: Formats = DefaultFormats
    val arr = parse(json).asInstanceOf[JArray].arr
    Pipeline(arr.map { j =>
      (j \ "type").extract[String] match {
        case "expr" =>
          ExprStep((j \ "cols").extract[Seq[Seq[String]]]
            .map(c => (c(0), c(1))))
        case "filter" => FilterStep((j \ "cond").extract[String])
        case "select" => SelectStep((j \ "exprs").extract[Seq[String]])
        case "drop"   => DropStep((j \ "cols").extract[Seq[String]])
        case "sort"   => SortStep((j \ "by").extract[Seq[String]],
          (j \ "desc").extract[Boolean])
        case "sql"    => SqlStep((j \ "query").extract[String])
        case "explode" => ExplodeStep((j \ "column").extract[String])
        case "rename" => RenameStep((j \ "mapping")
          .extract[Seq[Seq[String]]].map(p => (p(0), p(1))))
        case "group_by_agg" => GroupByAggStep(
          (j \ "keys").extract[Seq[String]],
          (j \ "aggs").extract[Seq[String]])
        case t => throw new IllegalArgumentException(s"unknown step $t")
      }
    })
  }
}

/** Fallback policy for target/woe/iv encoders: what unseen-at-fit and
  * null values map to at transform time
  * (transforms.py:471 _encoder_default_value — "null" | "zero" |
  * "mean" | a literal number). */
sealed trait EncoderDefault
object EncoderDefault {
  /** unseen/null → null (the reference's default) */
  case object NullValue extends EncoderDefault
  /** unseen/null → 0.0 */
  case object Zero extends EncoderDefault
  /** unseen/null → mean of the target over the FIT frame */
  case object Mean extends EncoderDefault
  /** unseen/null → a fixed number */
  final case class Value(v: Double) extends EncoderDefault
}

/** A fit step that is exactly "two train quantiles per column → one
  * SQL expression per column". Reified (rather than an opaque closure)
  * so `Blueprint.materialize` can BATCH a consecutive run of these
  * into one [[graft.util.Quantiles.exactRaw]] pass per column: a
  * winsorize followed by a robustScale on the same column otherwise
  * costs two full count+cumsum scans that rank the very same values.
  * `isClip` marks steps whose transform is the monotone clip
  * `least(greatest(c, a), b)` — the property that makes batching
  * exact (order statistics of the clipped data are the clipped
  * order statistics, elementwise, in the same doubles). */
private[pipeline] final class QuantileFit(
    val cols: Seq[String], val qLo: Double, val qHi: Double,
    val method: String, val isClip: Boolean,
    val mk: (String, Double, Double) => (String, String))
  extends (DataFrame => Step) {
  def apply(df: DataFrame): Step = ExprStep(cols.map { c =>
    val qs = graft.util.Quantiles.exact(df, c, Seq(qLo, qHi), method)
    mk(c, qs(0), qs(1))
  })
}

/** Step recorder: concrete steps pass through; fit steps hold a
  * closure run against the train frame at materialize().
  * (Blueprint, pipeline.py:250; FitStep _step.py:420) */
final class Blueprint private (
    train: DataFrame,
    steps: Vector[Either[DataFrame => Step, Step]]) {

  private def add(s: Step) = new Blueprint(train, steps :+ Right(s))
  private def addFit(f: DataFrame => Seq[(String, String)]) =
    new Blueprint(train, steps :+ Left(df => ExprStep(f(df))))
  private def addFitStep(f: DataFrame => Step) =
    new Blueprint(train, steps :+ Left(f))


  // SQL literal for a double that survives round-trip exactly
  private def dlit(v: Double): String =
    if (v.isNaN) "cast('NaN' as double)"
    else s"cast('${java.lang.Double.toString(v)}' as double)"
  private def slit(s: String): String = "'" + s.replace("'", "''") + "'"

  // SQL for the encoder fallback; Mean runs one tiny agg on the fit
  // frame (transforms.py:486 — target mean over the TRAIN data)
  private def encoderDefaultSql(df: DataFrame, target: String,
                                default: EncoderDefault): String =
    default match {
      case EncoderDefault.NullValue => "NULL"
      case EncoderDefault.Zero      => dlit(0.0)
      case EncoderDefault.Value(v)  => dlit(v)
      case EncoderDefault.Mean =>
        val m = df.agg(avg(col(target).cast("double"))).head
        if (m.isNullAt(0)) "NULL" else dlit(m.getDouble(0))
    }

  // ---- fit transforms (transforms.py) ----

  /** impute with train mean/median/mode. (transforms.py:26) */
  def impute(cols: Seq[String], method: String = "mean"): Blueprint =
    addFit { df =>
      cols.map { c =>
        val v = method match {
          case "mean"   => df.agg(avg(col(c))).head.getDouble(0)
          case "median" => df.agg(percentile(col(c), lit(0.5)))
            .head.getDouble(0)
          case "mode" => df.groupBy(col(c)).count()
            .filter(col(c).isNotNull)
            .orderBy(col("count").desc, col(c)).head.getDouble(0)
          case m => throw new IllegalArgumentException(m)
        }
        c -> s"coalesce($c, ${dlit(v)})"
      }
    }

  /** Replace every value where `cond` holds (SQL predicate) with the
    * train statistic learned on the rows where it does NOT hold —
    * the condition marks the BAD values, so matching rows are replaced
    * whether null or not, and the statistic never learns from them
    * (transforms.py:53-85 conditional_impute: `filter(rule.not_())`
    * then `when(rule).then(stat).otherwise(col)`). */
  def conditionalImpute(cols: Seq[String], cond: String,
                        method: String = "mean"): Blueprint =
    addFit { df =>
      val sub = df.filter(!expr(cond))
      cols.map { c =>
        val v = method match {
          case "mean"   => sub.agg(avg(col(c))).head.getDouble(0)
          case "median" => sub.agg(percentile(col(c), lit(0.5)))
            .head.getDouble(0)
          case m => throw new IllegalArgumentException(m)
        }
        c -> s"CASE WHEN ($cond) THEN ${dlit(v)} ELSE $c END"
      }
    }

  /** Fill nulls in `c` with a multi-feature OLS prediction, fit on the
    * rows where target and every feature are non-null — the exact
    * reference semantics (transforms.py:115 linear_impute:
    * null_policy="skip", `add_bias=False` by default). */
  def linearImputeMulti(c: String, features: Seq[String],
                        addBias: Boolean = false): Blueprint =
    addFit { df =>
      val feats = features.map(f => col(f).cast("double")) ++
        (if (addBias) Seq(lit(1.0)) else Nil)
      val clean = df.filter((col(c) +: features.map(col))
        .map(_.isNotNull).reduce(_ && _))
      val (xtx, xty, _) = graft.linear.Gram.collect(clean, feats,
        col(c).cast("double"), lit(1.0))
      val beta = graft.linear.Solvers.solve(xtx, xty)
      val terms = features.zip(beta).map { case (f, b) =>
        s"${dlit(b)} * $f" } ++
        (if (addBias) Seq(dlit(beta.last)) else Nil)
      Seq(c -> s"coalesce(cast($c as double), ${terms.mkString(" + ")})")
    }

  /** fill nulls with a simple-regression prediction from `by`.
    * (transforms.py:115 linear_impute) */
  def linearImpute(c: String, by: String): Blueprint = addFit { df =>
    val r = df.filter(col(c).isNotNull)
      .agg((covar_samp(col(by), col(c)) / var_samp(col(by))).as("sl"),
        avg(col(c)).as("my"), avg(col(by)).as("mx")).head
    val slope = r.getDouble(0)
    val inter = r.getDouble(1) - slope * r.getDouble(2)
    Seq(c -> s"coalesce($c, ${dlit(slope)} * $by + ${dlit(inter)})")
  }

  /** subtract train mean. (transforms.py:158 center) */
  def center(cols: Seq[String]): Blueprint = addFit { df =>
    cols.map { c =>
      val m = df.agg(avg(col(c))).head.getDouble(0)
      c -> s"$c - ${dlit(m)}"
    }
  }

  /** standard / min_max / abs_max scaling. (transforms.py:173 scale)
    * Standard uses the POPULATION std (polars std(ddof=0),
    * transforms.py:198 — what sklearn's StandardScaler does), and a
    * degenerate column (zero std / min==max / all-zero) is left
    * untransformed rather than divided by zero (transforms.py:204). */
  def scale(cols: Seq[String], method: String = "standard"): Blueprint =
    addFit { df =>
      cols.flatMap { c =>
        method match {
          case "standard" =>
            val r = df.agg(avg(col(c)), stddev_pop(col(c))).head
            if (r.getDouble(1) == 0.0) None
            else Some(c ->
              s"($c - ${dlit(r.getDouble(0))}) / ${dlit(r.getDouble(1))}")
          case "min_max" =>
            val r = df.agg(min(col(c)), max(col(c))).head
            val (lo, hi) = (r.getDouble(0), r.getDouble(1))
            if (hi == lo) None
            else Some(c -> s"($c - ${dlit(lo)}) / ${dlit(hi - lo)}")
          case "abs_max" =>
            val m = df.agg(max(abs(col(c)))).head.getDouble(0)
            if (m == 0.0) None else Some(c -> s"$c / ${dlit(m)}")
          case m => throw new IllegalArgumentException(m)
        }
      }
    }

  /** (x - q_low) / (q_high - q_low) on train quantiles — shifted by
    * the LOW quantile, not centered on the median.
    * (transforms.py:238 robust_scale; default method "midpoint") */
  def robustScale(cols: Seq[String], qLow: Double = 0.25,
                  qHigh: Double = 0.75,
                  method: String = "midpoint"): Blueprint = {
    require(qLow >= 0.0 && qHigh <= 1.0 && qLow < qHigh,
      s"robustScale bounds must satisfy 0 <= $qLow < $qHigh <= 1")
    new Blueprint(train, steps :+ Left(new QuantileFit(
      cols, qLow, qHigh, method, isClip = false,
      (c, lo, hi) => c -> s"($c - ${dlit(lo)}) / ${dlit(hi - lo)}")))
  }

  /** clip to train quantiles. (transforms.py:279 winsorize; default
    * method "nearest", polars' quantile default) */
  def winsorize(cols: Seq[String], lower: Double = 0.05,
                upper: Double = 0.95,
                method: String = "nearest"): Blueprint = {
    require(lower >= 0.0 && upper <= 1.0 && lower < upper,
      s"winsorize bounds must satisfy 0 <= $lower < $upper <= 1")
    new Blueprint(train, steps :+ Left(new QuantileFit(
      cols, lower, upper, method, isClip = true,
      (c, lo, hi) => c -> s"least(greatest($c, ${dlit(lo)}), ${dlit(hi)})")))
  }

  /** one column per distinct train value (sorted; optionally dropping
    * the first — reference semantics: collects uniques at fit time).
    * (transforms.py:320 one_hot_encode) */
  def oneHotEncode(cols: Seq[String], dropFirst: Boolean = false,
                   sep: String = "_"): Blueprint = addFit { df =>
    cols.flatMap { c =>
      val vals = graft.util.Guard.cappedDistinct(df, c, "oneHotEncode")
        .map(_.toString)
      val use = if (dropFirst) vals.drop(1) else vals
      // null-safe equality: the reference uses eq_missing so a null
      // row yields 0 in every indicator, never null
      // (transforms.py:357 "Need only True and False, not null")
      use.toSeq.map(v =>
        s"$c$sep$v" -> s"cast($c <=> ${slit(v)} as int)")
    }
  }

  /** map sorted distinct values → 0..n-1; `unknownValue` is assigned to
    * values unseen at fit time, `nullValue` to nulls (both default to
    * null — transforms.py:371 ordinal_encode, whose null check runs
    * BEFORE the value mapping). */
  def ordinalEncode(cols: Seq[String],
                    unknownValue: Option[Double] = None,
                    nullValue: Option[Double] = None): Blueprint =
    addFit { df =>
      cols.map { c =>
        val vals = graft.util.Guard.cappedDistinct(df, c, "ordinalEncode")
          .map(_.toString)
        val cases = vals.zipWithIndex
          .map { case (v, i) => s"WHEN $c = ${slit(v)} THEN $i" }
          .mkString(" ")
        val nullSql = nullValue.map(dlit).getOrElse("NULL")
        val unkSql = unknownValue.map(dlit).getOrElse("NULL")
        c -> s"CASE WHEN $c IS NULL THEN $nullSql $cases ELSE $unkSql END"
      }
    }

  /** ordered threshold encoding: value ≥ sorted-distinct[i] per level.
    * (transforms.py:431 rank_hot_encode, auto-ranking convenience) */
  def rankHotEncode(c: String, sep: String = "_ge_"): Blueprint =
    addFit { df =>
      val vals = graft.util.Guard.cappedDistinct(df, c, "rankHotEncode")
        .map(_.toString)
      vals.drop(1).toSeq.map(v =>
        s"$c$sep$v" -> s"cast($c >= ${slit(v)} as int)")
    }

  /** The reference's exact rank_hot_encode: the RANKING IS USER-GIVEN
    * (e.g. bad < neutral < good — not lexicographic); indicator i is
    * rank(value) ≥ i, and values outside the ranking (or null) get
    * null in every indicator (test_transforms.py:322-343). */
  def rankHotEncode(c: String, ranking: Seq[String], sep: String)
      : Blueprint = rankHotEncode(c, ranking, sep, None)

  /** As above with `defaultRank` (transforms.py:434): the rank given to
    * null/unseen values; None keeps them null in every indicator. */
  def rankHotEncode(c: String, ranking: Seq[String], sep: String,
                    defaultRank: Option[Int]): Blueprint = {
    require(ranking.size >= 2, "ranking needs at least two levels")
    val elseSql = defaultRank.map(_.toString).getOrElse("NULL")
    val rankExpr = "CASE " + ranking.zipWithIndex
      .map { case (v, i) => s"WHEN $c = ${slit(v)} THEN $i" }
      .mkString(" ") + s" ELSE $elseSql END"
    add(ExprStep(ranking.drop(1).zipWithIndex.map { case (v, i) =>
      s"$c$sep$v" -> s"cast(($rankExpr) >= ${i + 1} as int)"
    }))
  }

  /** smoothed mean-target encoding (same math as
    * EncodeOps.targetEncode). (transforms.py:503 target_encode) */
  def targetEncode(c: String, target: String,
                   minSamplesLeaf: Double = 20,
                   smoothing: Double = 10.0,
                   default: EncoderDefault = EncoderDefault.NullValue)
      : Blueprint = addFit { df =>
    val mapping = graft.ops.EncodeOps
      .targetEncode(df, col(c), col(target), minSamplesLeaf, smoothing)
      .collect().filter(!_.isNullAt(0))
      .map(r => r.get(0).toString -> r.getDouble(1))
    // nulls and unseen values both fall through to ELSE — the
    // reference maps BOTH to the default (transforms.py:514
    // "Nulls will always be mapped to the default")
    val fallback = encoderDefaultSql(df, target, default)
    val cases = mapping
      .map { case (v, e) => s"WHEN $c = ${slit(v)} THEN ${dlit(e)}" }
      .mkString(" ")
    Seq(c -> s"CASE $cases ELSE $fallback END")
  }

  /** WoE encoding. (transforms.py:562 woe_encode) */
  def woeEncode(c: String, target: String,
                default: EncoderDefault = EncoderDefault.NullValue)
      : Blueprint = addFit { df =>
    val mapping = graft.ops.EncodeOps
      .woeDiscrete(df, col(c), col(target))
      .collect().filter(!_.isNullAt(0))
      .map(r => r.get(0).toString -> r.getDouble(1))
    val fallback = encoderDefaultSql(df, target, default)
    val cases = mapping
      .map { case (v, e) => s"WHEN $c = ${slit(v)} THEN ${dlit(e)}" }
      .mkString(" ")
    Seq(c -> s"CASE $cases ELSE $fallback END")
  }

  /** Information-Value encoding: category → its IV component (same +1
    * smoothing as EncodeOps.infoValue). (transforms.py:615 iv_encode) */
  def ivEncode(c: String, target: String,
               default: EncoderDefault = EncoderDefault.NullValue)
      : Blueprint = addFit { df =>
    val mapping = graft.ops.EncodeOps
      .infoValue(df, col(c), col(target))
      .collect().filter(!_.isNullAt(0))
      .map(r => r.get(0).toString -> r.getDouble(1))
    val fallback = encoderDefaultSql(df, target, default)
    val cases = mapping
      .map { case (v, e) => s"WHEN $c = ${slit(v)} THEN ${dlit(e)}" }
      .mkString(" ")
    Seq(c -> s"CASE $cases ELSE $fallback END")
  }

  /** NaN → null in every float/double column. (pipeline.py:415
    * nan_to_null; the reference's cs.float() selector → schema scan) */
  def nanToNull(): Blueprint = addFit { df =>
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    df.schema.fields.toSeq
      .filter(f => f.dataType == DoubleType || f.dataType == FloatType)
      .map(f => f.name ->
        s"CASE WHEN isnan(${f.name}) THEN NULL ELSE ${f.name} END")
  }

  /** Cast every integer column to float (f32) or double. (pipeline.py:422
    * int_to_float) */
  def intToFloat(f32: Boolean = true): Blueprint = addFit { df =>
    import org.apache.spark.sql.types._
    val target = if (f32) "float" else "double"
    df.schema.fields.toSeq
      .filter(f => Seq(ByteType, ShortType, IntegerType, LongType)
        .contains(f.dataType))
      .map(f => f.name -> s"cast(${f.name} as $target)")
  }

  /** Cast every boolean column to an integer type. (pipeline.py:367
    * cast_bools; Spark has no unsigned — int replaces UInt8) */
  def castBools(dtype: String = "int"): Blueprint = addFit { df =>
    import org.apache.spark.sql.types.BooleanType
    df.schema.fields.toSeq.filter(_.dataType == BooleanType)
      .map(f => f.name -> s"cast(${f.name} as $dtype)")
  }

  /** drop columns whose train std is outside [lo, hi].
    * (transforms.py:668 select_by_std) */
  def selectByStd(cols: Seq[String], lo: Double, hi: Double): Blueprint =
    addFitStep { df =>
      val aggs = cols.map(c => stddev_samp(col(c)).as(c))
      val r = df.agg(aggs.head, aggs.tail: _*).head
      val dropCols = cols.zipWithIndex.collect {
        case (c, i) if r.getDouble(i) < lo || r.getDouble(i) > hi => c
      }
      DropStep(dropCols)
    }

  /** pairwise products up to degree 2. (transforms.py:696
    * polynomial_features) */
  def polynomialFeatures(cols: Seq[String],
                         interactionOnly: Boolean = false): Blueprint = {
    val pairs = for {
      i <- cols.indices; j <- i until cols.length
      if !(interactionOnly && i == j)
    } yield (cols(i), cols(j))
    add(ExprStep(pairs.map { case (a, b) => s"${a}_x_$b" -> s"$a * $b" }))
  }

  // ---- structural steps ----
  def filter(cond: String): Blueprint = add(FilterStep(cond))
  def withColumns(cols: (String, String)*): Blueprint =
    add(ExprStep(cols.toSeq))
  def select(exprs: String*): Blueprint = add(SelectStep(exprs.toSeq))
  def drop(cols: String*): Blueprint = add(DropStep(cols.toSeq))
  def sort(by: Seq[String], desc: Boolean = false): Blueprint =
    add(SortStep(by, desc))
  def sql(query: String): Blueprint = add(SqlStep(query))
  def explodeCol(column: String): Blueprint = add(ExplodeStep(column))
  def rename(mapping: (String, String)*): Blueprint =
    add(RenameStep(mapping.toSeq))
  def groupByAgg(keys: Seq[String], aggs: Seq[String]): Blueprint =
    add(GroupByAggStep(keys, aggs))

  /** Run every fit step against the (current) train frame and freeze
    * the result. Each fit step sees the train frame with all PREVIOUS
    * steps applied (reference semantics, pipeline.py:1027). */
  def materialize(): Pipeline = {
    var cur = train
    val out = Vector.newBuilder[Step]
    var i = 0
    while (i < steps.length) {
      steps(i) match {
        case Right(s) =>
          out += s; cur = s(cur); i += 1
        case Left(qf: QuantileFit) =>
          // Batch the maximal run of consecutive quantile fits that is
          // EXACTLY equivalent to fitting them sequentially: a later
          // fit may join the run only if every earlier run member
          // sharing one of its columns is a clip (winsorize). Clips
          // are monotone per-value maps, so the later fit's order
          // statistics on the clipped data are obtained by clipping
          // the order statistics of the run-start data — same doubles,
          // no recomputation. Non-clip members (robustScale's affine
          // map) don't commute bit-exactly, so they end the run for
          // their columns.
          val run = scala.collection.mutable.ArrayBuffer(qf)
          var j = i + 1
          var open = true
          while (open && j < steps.length) steps(j) match {
            case Left(q2: QuantileFit)
                if q2.cols.forall(c =>
                  run.forall(r => !r.cols.contains(c) || r.isClip)) =>
              run += q2; j += 1
            case _ => open = false
          }
          if (run.length == 1) {
            val s = qf(cur); out += s; cur = s(cur); i += 1
          } else {
            // one exactRaw pass per column, at the run-start frame
            val raws: Map[String, Seq[graft.util.Quantiles.Raw]] =
              run.flatMap(_.cols).distinct.map { c =>
                val entries = run.filter(_.cols.contains(c)).flatMap(r =>
                  Seq((r.qLo, r.method), (r.qHi, r.method))).toSeq
                c -> graft.util.Quantiles.exactRaw(cur, c, entries)
              }.toMap
            // walk the run in order, consuming two raws per (step,
            // column) and threading each column's accumulated clip
            // chain through later steps' order statistics
            val cursor = scala.collection.mutable.Map[String, Int]()
              .withDefaultValue(0)
            val clips =
              scala.collection.mutable.Map[String, Vector[(Double, Double)]]()
                .withDefaultValue(Vector.empty)
            run.foreach { r =>
              val step = ExprStep(r.cols.map { c =>
                val k = cursor(c); cursor(c) = k + 2
                val chain = clips(c)
                def adj(v: Double) =
                  chain.foldLeft(v) { case (x, (a, b)) => clipLike(x, a, b) }
                val lo = raws(c)(k).mapped(adj).interp
                val hi = raws(c)(k + 1).mapped(adj).interp
                if (r.isClip) clips(c) = chain :+ (lo, hi)
                r.mk(c, lo, hi)
              })
              out += step
              cur = step(cur)
            }
            i = j
          }
        case Left(fit) =>
          val s = fit(cur)
          out += s
          cur = s(cur)
          i += 1
      }
    }
    Pipeline(out.result())
  }

  /** Driver-side twin of the SQL `least(greatest(v, a), b)` clip,
    * including Spark's NaN-is-greatest ordering: greatest(v, a) is NaN
    * if either is NaN; least(x, b) picks the non-NaN smaller value. */
  private def clipLike(v: Double, a: Double, b: Double): Double = {
    val g = if (v.isNaN || a.isNaN) Double.NaN else math.max(v, a)
    if (g.isNaN) b else if (b.isNaN) g else math.min(g, b)
  }

  def fitTransform(df: DataFrame): DataFrame = materialize().transform(df)
}

object Blueprint {
  def apply(train: DataFrame): Blueprint = new Blueprint(train, Vector.empty)
}
