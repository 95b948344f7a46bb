package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Round-12 fifth wave: the composed robust anomaly detector
  * (Theil-Sen detrend → day-of-week effect → MAD outliers) and the
  * Count-Min rank-fidelity grader.
  */
object Round12eQueries {

  private val dec = DecimalType(38, 0)

  // -- q251: robust daily-revenue anomaly detector -----------------------------
  // The STL-shaped composition an alerting pipeline actually runs,
  // built from pieces this engine already owns and kept exact
  // end-to-end: (1) Theil-Sen slope over the day-grain pair fan-out
  // (the q228 bucketed-census median — DOUBLED (v₁+v₂) so the
  // half-integer median stays an exact BIGINT), (2) detrended₂ =
  // 2·r·10⁶ − slope₂·d in exact integers, (3) a day-of-week effect
  // as the trunc-div mean per epoch-day-mod-7 (both engines truncate
  // toward zero — the q228 negative-safe contract), (4) residuals
  // scaled to whole dollars and flagged by the q103 MAD rule, with
  // the median/MAD interpolated over the DAY-GRAIN frame (thousands
  // of rows — the q117 small-frame percentile class). Output: one
  // row per anomalous day, with the census totals and the slope
  // riding along.
  private val AnomK = 4.4478 // 3 sigma * 1.4826

  private def q251(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice"))).as("r"))
      .select(col("day"), unix_date(col("day")).cast(LongType).as("d"),
        col("r"))
      .localCheckpoint(true)
    // the slope median runs the 3-pass pair-stream selection (round
    // 17, shared with q228): no pair-sized census ever materializes,
    // so the day² fan-out costs compute but never spills. Round 18:
    // the scalar stats of the chain (slope, day count, med, mad,
    // outlier count) ride as DRIVER LITERALS instead of one-row
    // broadcast frames — each broadcast re-executed its subtree and
    // cost a build job per consumer (~60-150 ms/job on the bench
    // host); q251 went from 47 scheduler jobs to ~22.
    val nDays = daily.count()
    val sm = graft.ops.StatsOps.pairSlopeMedianParts(daily, "d", "r", nDays)
    val slope2u: Long = (sm.v1, sm.v2) match {
      case (Some(a), Some(b)) => a + b
      case _ => throw new IllegalStateException(
        "q251: degenerate day frame (no slope pairs)")
    }
    val detr = daily
      .select(col("day"), col("r"), (col("d") % 7).as("dow"),
        (lit(2L) * col("r") * lit(1000000L) - lit(slope2u) * col("d"))
          .as("dt2"))
    val dowEff = detr.groupBy("dow")
      .agg(expr("sum(cast(dt2 as decimal(38,0))) div count(1)").as("m2"))
    val resid = detr.join(broadcast(dowEff), "dow")
      .select(col("day"), col("r"),
        expr("(dt2 - m2) div 2000000").as("resid_s"))
      .localCheckpoint(true) // med/mad probe + the outlier filter
    val med: Double = resid
      .agg(element_at(percentile(col("resid_s"), array(lit(0.5))), 1))
      .head().getDouble(0)
    val mad: Double = resid
      .agg(element_at(percentile(abs(col("resid_s").cast(DoubleType) -
        lit(med)), array(lit(0.5))), 1))
      .head().getDouble(0)
    val out = resid
      .where(abs(col("resid_s").cast(DoubleType) - lit(med)) >
        lit(AnomK) * lit(mad))
      .localCheckpoint(true) // rows + the outlier count
    val nOut = out.count()
    out.select(col("day"), col("r"), col("resid_s"),
        lit(nDays).as("n_days"), lit(nOut).as("n_out"),
        Norm.n4(lit(slope2u).cast(DoubleType) / lit(2000000.0))
          .as("slope_n4"))
      .orderBy("day")
  }

  private val q251Oracle: String =
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
       |      AS d,
       |    CAST(sum(floor(o_totalprice)) AS BIGINT) AS r
       |  FROM orders GROUP BY 1, 2),
       |slopes AS (SELECT (b.r - a.r) * 1000000 // (b.d - a.d) AS s
       |  FROM daily a JOIN daily b ON a.d < b.d),
       |sr AS (SELECT s, row_number() OVER (ORDER BY s) - 1 AS rk,
       |    count(*) OVER () AS np FROM slopes),
       |sl AS (SELECT CAST(sum(CASE WHEN rk = (np - 1) // 2 THEN s ELSE 0
       |      END) + sum(CASE WHEN rk = np // 2 THEN s ELSE 0 END)
       |      AS BIGINT) AS slope2_u
       |  FROM sr WHERE rk = (np - 1) // 2 OR rk = np // 2),
       |detr AS (SELECT day, r, d % 7 AS dow,
       |    2 * r * 1000000 - slope2_u * d AS dt2, slope2_u
       |  FROM daily CROSS JOIN sl),
       |de AS (SELECT dow,
       |    CAST(sum(CAST(dt2 AS HUGEINT)) // count(*) AS BIGINT) AS m2
       |  FROM detr GROUP BY 1),
       |resid AS (SELECT day, r, slope2_u,
       |    CAST((dt2 - m2) // 2000000 AS BIGINT) AS resid_s
       |  FROM detr JOIN de USING (dow)),
       |bands AS (SELECT count(*) AS n_days,
       |    quantile_cont(resid_s, 0.5) AS med,
       |    any_value(slope2_u) AS slope2_u
       |  FROM resid),
       |m AS (SELECT quantile_cont(abs(CAST(resid_s AS DOUBLE) - med), 0.5)
       |    AS mad FROM resid CROSS JOIN bands),
       |o AS (SELECT day, r, resid_s FROM resid CROSS JOIN bands
       |    CROSS JOIN m
       |  WHERE abs(CAST(resid_s AS DOUBLE) - med)
       |    > CAST('$AnomK' AS DOUBLE) * mad),
       |c AS (SELECT count(*) AS n_out FROM o)
       |SELECT day, r, resid_s, n_days, n_out,
       |  ${graft.etl.OracleSql.n4(
      "CAST(slope2_u AS DOUBLE) / 2000000.0")} AS slope_n4
       |FROM o CROSS JOIN c CROSS JOIN bands
       |ORDER BY day""".stripMargin

  // -- q252: Count-Min rank-fidelity grader ------------------------------------
  // q126 checks the sketch's ESTIMATES against exact counts on the
  // exact top keys; this grades what a 100 TB deployment actually
  // does with the sketch — RANK BY IT: estimate every key from the
  // depth×width counter grid (census-sized map-side work, the domain
  // never materializes per-row state), take the top-20 BY ESTIMATE,
  // and measure recall against the exact top-20 plus the worst
  // overestimate inside the sketch-ranked list. A hash-collision
  // regime that would promote wrong keys fails the recall gate at
  // whichever SF it bites.
  private val CmsK = 20
  private val CmsDepth = 4
  private val CmsWidth = 1024

  private def q252(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ops.SketchOps
    val est = SketchOps.cmsEstimateAll(
      Tables.read(spark, sfDir, "lineitem"), "l_partkey",
      CmsDepth, CmsWidth)
      .localCheckpoint(true) // exact top-k + est top-k share it
    val exactTop = est.orderBy(col("exact_cnt").desc, col("l_partkey"))
      .limit(CmsK).select(col("l_partkey"))
    val estTop = est.orderBy(col("est_cnt").desc, col("l_partkey"))
      .limit(CmsK)
    val hits = estTop.join(broadcast(exactTop), Seq("l_partkey"), "left_semi")
      .agg(count(lit(1)).as("n_hits"))
    estTop.agg(count(lit(1)).as("k"),
        max(col("est_cnt") - col("exact_cnt")).as("max_over"))
      .crossJoin(broadcast(hits))
      .select(col("k"), col("n_hits"),
        expr("n_hits * 1000000 div k").as("recall_ppm"), col("max_over"))
  }

  private val q252Oracle: String = {
    import graft.ops.SketchOps
    s"""WITH est AS (${SketchOps.cmsEstimateAllSql("lineitem", "l_partkey",
      CmsDepth, CmsWidth)}),
       |et AS (SELECT l_partkey FROM est
       |  ORDER BY exact_cnt DESC, l_partkey LIMIT $CmsK),
       |st AS (SELECT * FROM est
       |  ORDER BY est_cnt DESC, l_partkey LIMIT $CmsK),
       |h AS (SELECT count(*) AS n_hits FROM st
       |  WHERE l_partkey IN (SELECT l_partkey FROM et))
       |SELECT count(*) AS k, any_value(n_hits) AS n_hits,
       |  CAST(any_value(n_hits) * 1000000 // count(*) AS BIGINT)
       |    AS recall_ppm,
       |  CAST(max(est_cnt - exact_cnt) AS BIGINT) AS max_over
       |FROM st CROSS JOIN h""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q251_robust_anomaly", q251, Some(q251Oracle)),
    QueryDef("q252_cms_rank_fidelity", q252, Some(q252Oracle)))
}
