package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** M1-M4 — high-null column drop + missing-value imputation
  * (reference: ETL_PROJECT.py:129-170).
  *
  * All statistics come from driver-collected aggregates injected back
  * as literals — never a single-partition window.
  */
object Imputer {

  /** Strictly-greater drop threshold (reference: ETL_PROJECT.py:129). */
  val dropThreshold = 0.8

  /** Per-column null COUNTS (not ratios — counts also feed the
    * cleaning-report counters) in one aggregate pass. NaN counts as
    * missing like pandas `isna` for double columns.
    */
  def nullCounts(df: DataFrame): Map[String, Long] = {
    val aggs = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val miss = f.dataType match {
        case DoubleType => c.isNull || isnan(c)
        case _          => c.isNull
      }
      count(when(miss, 1)).as(f.name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    df.schema.fields.map(f => f.name -> row.getLong(row.fieldIndex(f.name))).toMap
  }

  /** Exact interpolating medians (pandas-compatible, trap P4) for many
    * columns in one pass. `percentile` is Spark's exact percentile —
    * matches pandas `median` and DuckDB `quantile_cont(0.5)`. With
    * `approx` (100 TB mode) the sort-based exact aggregate becomes a
    * single-pass mergeable sketch.
    */
  def medians(df: DataFrame, cols: Seq[String], approx: Boolean = false,
      accuracy: Int = 10000): Map[String, Double] = {
    if (cols.isEmpty) return Map.empty
    val aggs =
      if (approx) cols.map(c => percentile_approx(col(c), lit(0.5), lit(accuracy)).as(c))
      else cols.map(c => percentile(col(c), lit(0.5)).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.flatMap { c =>
      val i = row.fieldIndex(c)
      if (row.isNullAt(i)) None else Some(c -> row.getDouble(i))
    }.toMap
  }

  /** Stage-4 statistics fused into ONE aggregate pass: per-column null
    * counts plus medians for every numeric-typed column. The median of
    * a column's non-null values is the same whether or not the column
    * turns out to need imputation, so computing it unconditionally is
    * safe — and one fused scan replaces the separate nullCounts +
    * medians jobs (percentile is a TypedImperative aggregate, counts
    * are declarative; they share one ObjectHashAggregate pass with no
    * Expand).
    */
  def nullsAndMedians(df: DataFrame, types: Map[String, ColType],
      config: EtlConfig = EtlConfig.exact): (Map[String, Long], Map[String, Double]) = {
    val numCols = df.columns.filter(c => types.get(c).contains(ColType.Numeric)).toSeq
    val nullAggs = df.schema.fields.toSeq.map { f =>
      val c = col(f.name)
      val miss = f.dataType match {
        case DoubleType => c.isNull || isnan(c)
        case _          => c.isNull
      }
      count(when(miss, 1)).as(s"__n::${f.name}")
    }
    val medAggs = numCols.map { c =>
      val p =
        if (config.approxPercentiles)
          percentile_approx(col(c), lit(0.5), lit(config.approxAccuracy))
        else percentile(col(c), lit(0.5))
      p.as(s"__m::$c")
    }
    val aggs = nullAggs ++ medAggs
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val nulls = df.schema.fields.map(f =>
      f.name -> row.getLong(row.fieldIndex(s"__n::${f.name}"))).toMap
    val med = numCols.flatMap { c =>
      val i = row.fieldIndex(s"__m::$c")
      if (row.isNullAt(i)) None else Some(c -> row.getDouble(i))
    }.toMap
    (nulls, med)
  }

  /** Deterministic mode: the SMALLEST value among the most frequent,
    * matching pandas `mode()[0]` which sorts (reference:
    * ETL_PROJECT.py:152; trap P5 — Spark's own `mode()` ties are
    * nondeterministic). Returns None when the column is all-null.
    */
  def mode(df: DataFrame, colName: String): Option[Any] =
    modes(df, Seq(colName)).get(colName)

  /** Deterministic modes for MANY columns in one job per distinct
    * column TYPE (values stack into a typed map-explode, so the
    * tie-break `value asc` ordering runs on the native type and the
    * returned literal keeps the column's type). A per-column loop of
    * groupBy jobs is N full scans — this is one scan + one shuffle of
    * (column, value) pairs per type.
    */
  def modes(df: DataFrame, cols: Seq[String]): Map[String, Any] = {
    if (cols.isEmpty) return Map.empty
    // the per-type jobs are independent — submit them concurrently from
    // the driver (each alone underutilizes the cluster on small frames)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.DurationInt
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = cols.groupBy(c => df.schema(c).dataType).toSeq.map {
      case (_, cs) => Future {
        modesFrame(df, cs).collect().map(r => r.getString(0) -> r.get(1))
      }
    }
    Await.result(Future.sequence(futures), 30.minutes).flatten.toMap
  }

  /** The per-type-group modes aggregation (one frame per distinct
    * column TYPE — callers stack same-typed columns so the tie-break
    * `value asc` runs on the native type). Aggregate-only: min of
    * struct(-count, value) == "highest count, then smallest value" —
    * partial/final combinable, no single-partition window even for
    * high-cardinality columns (plan-asserted in PlanSpec).
    */
  def modesFrame(df: DataFrame, cs: Seq[String]): DataFrame = {
    val stacked = df
      .select(explode(map(cs.flatMap(c => Seq(lit(c), col(c))): _*)).as(Seq("__c", "__v")))
      .where(col("__v").isNotNull)
    stacked.groupBy("__c", "__v").agg(count(lit(1)).as("__n"))
      .groupBy("__c")
      .agg(min(struct((-col("__n")).as("negn"), col("__v").as("v"))).as("m"))
      .select(col("__c"), col("m.v"))
  }

  /** The imputation decision for one column. */
  sealed trait Decision
  case object Drop extends Decision
  case class FillMedian(v: Double) extends Decision
  case class FillMode(v: Any) extends Decision
  case object Keep extends Decision

  /** Decide per column like the reference loop (ETL_PROJECT.py:134-162):
    * ratio > 0.8 -> drop; ratio > 0 -> median (numeric) / mode (rest).
    */
  def decide(
      df: DataFrame,
      types: Map[String, ColType],
      nulls: Map[String, Long],
      totalRows: Long,
      config: EtlConfig = EtlConfig.exact): Map[String, Decision] = {
    val needMedian = df.columns.filter(c =>
      types.get(c).contains(ColType.Numeric)).toSeq
    decideWith(df, types, nulls, totalRows,
      medians(df, needMedian, config.approxPercentiles, config.approxAccuracy))
  }

  /** [[decide]] with the medians already computed (by the fused
    * [[nullsAndMedians]] pass); runs only the mode jobs.
    */
  def decideWith(
      df: DataFrame,
      types: Map[String, ColType],
      nulls: Map[String, Long],
      totalRows: Long,
      med: Map[String, Double]): Map[String, Decision] = {
    val ratios = nulls.view.mapValues(n =>
      if (totalRows == 0) 0.0 else n.toDouble / totalRows).toMap
    val needMode = df.columns.filter { c =>
      ratios(c) <= dropThreshold && ratios(c) > 0 &&
        !types.get(c).contains(ColType.Numeric)
    }.toSeq
    val mod = modes(df, needMode)
    df.columns.toSeq.map { c =>
      val r = ratios(c)
      val d: Decision =
        if (r > dropThreshold) Drop
        else if (r > 0) types.get(c) match {
          case Some(ColType.Numeric) =>
            med.get(c).map(FillMedian).getOrElse(FillMode("Unknown"))
          case _ =>
            mod.get(c).map(FillMode).getOrElse(FillMode("Unknown"))
        }
        else Keep
      c -> d
    }.toMap
  }

  /** Apply decisions: drop + coalesce-fill in one projection. */
  def apply(df: DataFrame, decisions: Map[String, Decision]): DataFrame = {
    val kept = df.columns.filterNot(c => decisions.get(c).contains(Drop))
    val cols: Seq[Column] = kept.toSeq.map { c =>
      decisions.get(c) match {
        case Some(FillMedian(v)) => coalesce(col(c), lit(v)).as(c)
        case Some(FillMode(v))   => coalesce(col(c), lit(v)).as(c)
        case _                   => col(c)
      }
    }
    df.select(cols: _*)
  }
}
