package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.ops.TextOps

/** Round-11 fourteenth wave: grading the lang-id heuristic against
  * the fixture's labels, and Theil-Sen robust trend estimation.
  */
object Round11nQueries {

  // -- q227: language-ID evaluation ------------------------------------------
  // q15 predicts; this GRADES it (the q154/q157/q161 pattern applied
  // to the text family): the fixture's `lang` column is the label, so
  // the confusion census and per-truth recall are exact. Tokens bind
  // ONCE before the 6-way stopword fold (the q15 lesson); one census
  // shuffle, recall from a broadcast per-truth total. The top-level
  // accuracy rides every row — the honest headline next to the
  // per-pair breakdown.
  private def q227(spark: SparkSession, sfDir: String): DataFrame = {
    val preds = Tables.read(spark, sfDir, "documents")
      .select(col("lang"), TextOps.tokens(col("text")).as("__toks"))
      .select(col("lang"), TextOps.langIdOf(col("__toks")).as("lang_pred"))
    val census = preds.groupBy("lang", "lang_pred")
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // tiny confusion frame; feeds all rollups
    val truthTotals = census.groupBy("lang").agg(sum(col("n")).as("nt"))
    val overall = census.agg(
      sum(col("n")).as("n_all"),
      sum(when(col("lang") === col("lang_pred"), col("n")).otherwise(0L))
        .as("n_ok"))
      .select(expr("n_ok * 1000000 div n_all").as("accuracy_ppm"))
    census.join(broadcast(truthTotals), "lang")
      .crossJoin(broadcast(overall))
      .select(col("lang"), col("lang_pred"), col("n"),
        expr("n * 1000000 div nt").as("recall_ppm"), col("accuracy_ppm"))
      .orderBy("lang", "lang_pred")
  }

  private val q227Oracle: String =
    s"""WITH p AS (SELECT lang, ${TextOps.langIdSql("text")} AS lang_pred
       |  FROM documents),
       |census AS (SELECT lang, lang_pred, count(*) AS n
       |  FROM p GROUP BY 1, 2),
       |tt AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nt
       |  FROM census GROUP BY 1),
       |o AS (SELECT CAST(sum(CASE WHEN lang = lang_pred THEN n ELSE 0 END)
       |    * 1000000 // sum(n) AS BIGINT) AS accuracy_ppm
       |  FROM census)
       |SELECT census.lang, lang_pred, n,
       |  CAST(n * 1000000 // tt.nt AS BIGINT) AS recall_ppm,
       |  o.accuracy_ppm
       |FROM census JOIN tt ON census.lang = tt.lang CROSS JOIN o
       |ORDER BY census.lang, lang_pred""".stripMargin

  // -- q228: Theil-Sen robust trend ------------------------------------------
  // The median-of-pairwise-slopes trend estimator — immune to the
  // revenue spikes that drag q115's OLS line around. Slopes live on
  // the DAY-GRAIN frame (daily revenue), so the pairwise expansion is
  // calendar-bounded (days², NOT data²) — the q149/q207 day-grain
  // argument squared, stated explicitly: at 100 TB the daily rollup
  // is the only data-sized pass, and a broadcast non-equi self-join
  // of the ~2.4k-row day frame is driver-grade work. Each slope is
  // integer micro-units/day (trunc div, negative-safe — both engines
  // round toward zero).
  //
  // The pairwise-slope MEDIAN is exact but materializes NO pair-sized
  // state (round 17; the r11 slope census was near-pair-cardinality
  // and spilled at 24k days): StatsOps.pairSlopeMedianParts makes
  // three O(small-state) passes over the implicit pair stream —
  // approx cuts + exact count, exact per-bucket counts, then an exact
  // rank pick inside the 1-2 median buckets only. quantile_cont
  // parity: (v₍k₁₎+v₍k₂₎)/2 with k₁=(n−1) div 2, k₂=n div 2 equals
  // DuckDB's v₍k₁₎+frac·(v₍k₂₎−v₍k₁₎) exactly (longs ≪ 2⁵³,
  // frac ∈ {0, 0.5}). The OLS slope (exact decimal sums, one double
  // division) rides along for the robustness comparison.
  private def q228(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice"))).as("r"))
      .select(unix_date(col("day")).cast(LongType).as("d"), col("r"))
      .localCheckpoint(true) // day-grain frame: pairs + OLS moments
    // the Theil-Sen median parts are CONFIG-bounded scalars (round 18):
    // they ride as literals, so the OLS pass is the only remaining
    // distributed subtree of the output plan
    val nDays = daily.count()
    val ts = graft.ops.StatsOps.pairSlopeMedianParts(daily, "d", "r", nDays)
    val med: Column = (ts.v1, ts.v2) match {
      case (Some(a), Some(b)) => lit((a + b).toDouble / 2.0)
      case _ => lit(null).cast(DoubleType)
    }
    val ols = daily.agg(
      count(lit(1)).as("n_days"),
      count(lit(1)).cast(dec).as("nn"),
      sum(col("d")).cast(dec).as("sd"), sum(col("r")).cast(dec).as("sr"),
      sum(col("d").cast(dec) * col("d").cast(dec)).as("sdd"),
      sum(col("d").cast(dec) * col("r").cast(dec)).as("sdr"))
      .select(col("n_days"),
        ((col("nn") * col("sdr") - col("sd") * col("sr")).cast(DoubleType) /
          (col("nn") * col("sdd") - col("sd") * col("sd")).cast(DoubleType))
          .as("__ols"))
    ols.select(col("n_days"), lit(ts.nPairs).as("n_pairs"),
      Norm.n4(med).as("theil_sen_u"),
      Norm.n4(col("__ols") * lit(1000000.0)).as("ols_u"))
  }

  private val q228Oracle: String =
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(floor(o_totalprice)) AS BIGINT) AS r
       |  FROM orders GROUP BY 1),
       |dd AS (SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS d, r
       |  FROM daily),
       |pairs AS (SELECT (b.r - a.r) * 1000000 // (b.d - a.d) AS slope_u
       |  FROM dd a JOIN dd b ON a.d < b.d),
       |ts AS (SELECT count(*) AS n_pairs,
       |    ${graft.etl.OracleSql.n4("quantile_cont(slope_u, 0.5)")} AS theil_sen_u
       |  FROM pairs),
       |ols AS (SELECT count(*) AS n_days,
       |    ${graft.etl.OracleSql.n4(
      "CAST(CAST(count(*) AS HUGEINT) * sum(CAST(d AS HUGEINT) * r) " +
        "- CAST(sum(d) AS HUGEINT) * sum(r) AS DOUBLE) " +
        "/ CAST(CAST(count(*) AS HUGEINT) * sum(CAST(d AS HUGEINT) * d) " +
        "- CAST(sum(d) AS HUGEINT) * sum(d) AS DOUBLE) * 1000000.0")} AS ols_u
       |  FROM dd)
       |SELECT ols.n_days, ts.n_pairs, ts.theil_sen_u, ols.ols_u
       |FROM ols CROSS JOIN ts""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q227_langid_eval", q227, Some(q227Oracle)),
    QueryDef("q228_theil_sen", q228, Some(q228Oracle)))
}
