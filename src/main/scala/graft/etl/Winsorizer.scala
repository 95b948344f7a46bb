package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** M5 — z-score outlier winsorization (reference: ETL_PROJECT.py:172-201).
  *
  * Stats (mean, sample stddev, exact p05/p95) are ONE aggregate pass,
  * injected as literals into a `when` chain — scalar aggregates plus a
  * projection, no global window, so the operator scales linearly.
  *
  * Semantics replicated exactly:
  *  - z = |x - mean| / stddev_samp (ddof=1, trap P10);
  *  - only rows with z > 3 are touched; a flagged value already inside
  *    [p05, p95] is left unchanged (nested where, ETL_PROJECT.py:187-195);
  *  - stddev of 0 (or NaN for n<=1) clamps nothing: pandas' 0/0 -> NaN
  *    comparison is False (trap P9) — here an explicit guard.
  */
object Winsorizer {

  val zThreshold = 3.0

  final case class Stats(mean: Double, std: Double, p05: Double, p95: Double) {
    /** pandas semantics: no finite positive spread -> no clamping */
    def active: Boolean = !std.isNaN && std > 0
  }

  /** One pass for every numeric column. Columns that are all-null (can't
    * happen post-impute, but be total) are omitted.
    */
  def stats(df: DataFrame, cols: Seq[String],
      config: EtlConfig = EtlConfig.exact): Map[String, Stats] = {
    if (cols.isEmpty) return Map.empty
    def pct(c: String, p: Double) =
      if (config.approxPercentiles)
        percentile_approx(col(c), lit(p), lit(config.approxAccuracy))
      else percentile(col(c), lit(p))
    val aggs = cols.flatMap { c =>
      Seq(
        avg(col(c)).as(s"$c::mean"),
        stddev_samp(col(c)).as(s"$c::std"),
        pct(c, 0.05).as(s"$c::p05"),
        pct(c, 0.95).as(s"$c::p95"),
      )
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def d(f: String): Option[Double] = {
      val i = row.fieldIndex(f)
      if (row.isNullAt(i)) None else Some(row.getDouble(i))
    }
    cols.flatMap { c =>
      for {
        m <- d(s"$c::mean"); s <- d(s"$c::std")
        lo <- d(s"$c::p05"); hi <- d(s"$c::p95")
      } yield c -> Stats(m, s, lo, hi)
    }.toMap
  }

  /** The clamp expression for one column given its stats. */
  def clampExpr(c: Column, st: Stats): Column =
    if (!st.active) c
    else {
      val z = abs((c - lit(st.mean)) / lit(st.std))
      when(z > zThreshold && c > lit(st.p95), lit(st.p95))
        .when(z > zThreshold && c < lit(st.p05), lit(st.p05))
        .otherwise(c)
    }

  /** Count of z-flagged rows per column (for the cleaning report),
    * one aggregate pass with the stats as literals.
    */
  def flaggedCounts(df: DataFrame, sts: Map[String, Stats]): Map[String, Long] = {
    val active = sts.filter(_._2.active).toSeq
    if (active.isEmpty) return Map.empty
    val aggs = active.map { case (c, st) =>
      val z = abs((col(c) - lit(st.mean)) / lit(st.std))
      count(when(z > zThreshold, 1)).as(c)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    active.map { case (c, _) => c -> row.getLong(row.fieldIndex(c)) }.toMap
  }

  /** Apply winsorization to the given numeric columns in one projection. */
  def apply(df: DataFrame, sts: Map[String, Stats]): DataFrame = {
    val cols: Seq[Column] = df.columns.toSeq.map { c =>
      sts.get(c) match {
        case Some(st) => clampExpr(col(c), st).as(c)
        case None     => col(c)
      }
    }
    df.select(cols: _*)
  }
}
