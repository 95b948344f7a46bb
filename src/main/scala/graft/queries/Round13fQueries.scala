package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.MultimodalOps

/** Round-13 sixth wave: serial-correlation diagnostics (q327 —
  * Durbin-Watson + Ljung-Box over the daily-revenue series, fully
  * integer-exact via integer-mean residuals and ppb grids), the gzip
  * container parse (q328 — ninth format; variable-length middle and
  * end-addressed trailer), inverse-propensity off-policy evaluation
  * (q329 — ε-greedy target policy scored from the logged (segment,
  * action) census), and Herfindahl-Hirschman revenue concentration
  * per nation (q330).
  */
object Round13fQueries {

  // -- q327: Durbin-Watson + Ljung-Box autocorrelation diagnostics -----------------
  // The residual-autocorrelation gate a forecasting pipeline runs
  // before trusting a model: DW = Σ(Δe)²/Σe² (≈2 means white noise)
  // and the Ljung-Box portmanteau Q(h) = n(n+2)·Σ_{k≤h} r_k²/(n−k)
  // over lags 1..5. Residuals are INTEGER-MEAN deviations e_t =
  // rev_u − (T div n) — exact BIGINTs, so every moment (Σe², Σ(Δe)²,
  // Σe·e_lag) is an exact DECIMAL(38,0)/HUGEINT sum; r_k lands on a
  // SIGN-SAFE ppb grid (trunc-div divergence class: Spark div
  // truncates, DuckDB // floors — never divide a possibly-negative
  // numerator directly), and Q is assembled FROM the gridded r_k so
  // no >2^53 square ever meets a float. One day-grain window pass
  // produces all five lags; the series frame is calendar-bounded.
  private def q327(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * lit(100) + lit(0.5))
        .cast(LongType)).as("rev_u"))
    val st = daily.agg(count(lit(1)).as("n"), sum(col("rev_u")).as("t"))
    val w = Window.orderBy("day") // day-grain series: calendar-bounded
    val e = daily.crossJoin(broadcast(st))
      .withColumn("e", col("rev_u") - expr("t div n"))
      .select(col("n"), col("e"),
        lag("e", 1).over(w).as("l1"), lag("e", 2).over(w).as("l2"),
        lag("e", 3).over(w).as("l3"), lag("e", 4).over(w).as("l4"),
        lag("e", 5).over(w).as("l5"))
    val moments = e.groupBy("n").agg(
      sum(expr("CAST(e AS DECIMAL(38,0)) * e")).as("d2"),
      sum(expr("CAST(e - l1 AS DECIMAL(38,0)) * (e - l1)")).as("dwn"),
      sum(expr("CAST(e AS DECIMAL(38,0)) * l1")).as("m1"),
      sum(expr("CAST(e AS DECIMAL(38,0)) * l2")).as("m2"),
      sum(expr("CAST(e AS DECIMAL(38,0)) * l3")).as("m3"),
      sum(expr("CAST(e AS DECIMAL(38,0)) * l4")).as("m4"),
      sum(expr("CAST(e AS DECIMAL(38,0)) * l5")).as("m5"))
    val cum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    moments
      .select(col("n"), col("d2"), col("dwn"),
        explode(expr("array(struct(1L AS k, m1 AS num)," +
          " struct(2L AS k, m2 AS num), struct(3L AS k, m3 AS num)," +
          " struct(4L AS k, m4 AS num), struct(5L AS k, m5 AS num))"))
          .as("kk"))
      .select(col("n"), col("d2"), col("dwn"), col("kk.k").as("k"),
        coalesce(col("kk.num"), lit(0L)).as("num"))
      .withColumn("r_ppb", expr("CASE WHEN num < 0" +
        " THEN -((-num) * 1000000000 div d2)" +
        " ELSE num * 1000000000 div d2 END"))
      .withColumn("q_term", expr("CAST(n * (n + 2) AS DECIMAL(38,0))" +
        " * r_ppb * r_ppb div ((n - k) * 1000000000)"))
      .select(col("k"), col("r_ppb"),
        sum(col("q_term")).over(cum).as("q_cum_ppb"),
        expr("dwn * 1000000000 div d2").as("dw_ppb"))
      .orderBy("k")
  }

  private val q327Oracle: String =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS rev_u
      |  FROM orders GROUP BY 1),
      |st AS (SELECT count(*) AS n, CAST(sum(rev_u) AS BIGINT) AS t
      |  FROM daily),
      |e AS (SELECT day, n, rev_u - (t // n) AS e FROM daily CROSS JOIN st),
      |lagged AS (SELECT n, e,
      |    lag(e, 1) OVER (ORDER BY day) AS l1,
      |    lag(e, 2) OVER (ORDER BY day) AS l2,
      |    lag(e, 3) OVER (ORDER BY day) AS l3,
      |    lag(e, 4) OVER (ORDER BY day) AS l4,
      |    lag(e, 5) OVER (ORDER BY day) AS l5 FROM e),
      |mo AS (SELECT n, sum(CAST(e AS HUGEINT) * e) AS d2,
      |    sum(CAST(e - l1 AS HUGEINT) * (e - l1)) AS dwn,
      |    sum(CAST(e AS HUGEINT) * l1) AS m1,
      |    sum(CAST(e AS HUGEINT) * l2) AS m2,
      |    sum(CAST(e AS HUGEINT) * l3) AS m3,
      |    sum(CAST(e AS HUGEINT) * l4) AS m4,
      |    sum(CAST(e AS HUGEINT) * l5) AS m5
      |  FROM lagged GROUP BY n),
      |terms AS (SELECT n, d2, dwn, CAST(k AS BIGINT) AS k,
      |    coalesce(CASE k WHEN 1 THEN m1 WHEN 2 THEN m2 WHEN 3 THEN m3
      |      WHEN 4 THEN m4 ELSE m5 END, 0) AS num
      |  FROM mo CROSS JOIN (SELECT * FROM (VALUES (1),(2),(3),(4),(5)) v(k))),
      |r AS (SELECT n, d2, dwn, k,
      |    CAST(CASE WHEN num < 0 THEN -((-num) * 1000000000 // d2)
      |      ELSE num * 1000000000 // d2 END AS BIGINT) AS r_ppb
      |  FROM terms),
      |q AS (SELECT k, r_ppb,
      |    CAST(n * (n + 2) AS HUGEINT) * r_ppb * r_ppb
      |      // ((n - k) * 1000000000) AS q_term,
      |    CAST(dwn * 1000000000 // d2 AS BIGINT) AS dw_ppb FROM r)
      |SELECT k, r_ppb,
      |  CAST(sum(q_term) OVER (ORDER BY k ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS q_cum_ppb,
      |  dw_ppb
      |FROM q ORDER BY k""".stripMargin

  // -- q328: gzip member metadata roundtrip -----------------------------------------
  // The ninth container format; what's NEW vs PNG/WAV/JPEG/MP4/BMP/
  // GIF/TIFF/TAR is the variable-length middle section — an FEXTRA
  // block behind an XLEN count and a NUL-terminated FNAME with no
  // length field anywhere (the parser must WALK it and reject an
  // unterminated run) — plus reserved FLG bits a conforming reader
  // rejects and a trailer addressed from the END of the member.
  // Every 7th payload carries a corrupted magic and must come back
  // NULL; fname_len ≡ 0 (mod 40) exercises the absent-FNAME path.
  private def q328(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val payload = MultimodalOps.gzipHeader(
      (col("doc_id") * 97) % 100000, col("n_chars") % 40,
      col("doc_id") % 3 === 0, col("doc_id") % 7 =!= 0)
    val meta = MultimodalOps.gzipMeta(col("payload"))
    d.select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"), meta.as("__m"))
      .select(col("doc_id"),
        col("__m").getItem(0).as("mtime"),
        col("__m").getItem(1).as("os"),
        col("__m").getItem(2).as("has_extra"),
        col("__m").getItem(3).as("fname_len"),
        col("__m").getItem(4).as("header_len"),
        col("__m").getItem(5).as("isize"))
      .orderBy("doc_id")
  }

  private val q328Oracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 <> 0 THEN (doc_id * 97) % 100000 END AS mtime,
      |  CASE WHEN doc_id % 7 <> 0 THEN CAST(3 AS BIGINT) END AS os,
      |  CASE WHEN doc_id % 7 <> 0 THEN
      |    CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    END AS has_extra,
      |  CASE WHEN doc_id % 7 <> 0 THEN n_chars % 40 END AS fname_len,
      |  CASE WHEN doc_id % 7 <> 0 THEN 10
      |    + CASE WHEN doc_id % 3 = 0 THEN 8 ELSE 0 END
      |    + CASE WHEN n_chars % 40 > 0 THEN n_chars % 40 + 1 ELSE 0 END
      |    END AS header_len,
      |  CASE WHEN doc_id % 7 <> 0 THEN (n_chars % 40) * 7 + 11 END AS isize
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q329: inverse-propensity off-policy evaluation --------------------------------
  // The counterfactual question behind every ranking/policy change:
  // what would an ε-greedy target policy (0.8 on the segment's
  // best-by-logged-reward action, 0.05 on each of the other four)
  // have earned, using only LOGGED data? With empirical logging
  // propensities p(a|s) = n_sa/n_s, the IPS estimator collapses to
  // cell algebra: V_target = Σ_a π'(a|s)·R_sa/n_sa — so the ONLY
  // data-sized operation is the (segment, action) census; the best-
  // action pick, the weighting, and both value heads run on the
  // ≤20-row cell frame. Everything is cents·ppm exact (DECIMAL/
  // HUGEINT partials, trunc-div last).
  private def q329(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.read(spark, sfDir, "events")
      .select((col("user_id") % 4).as("seg"), col("event_type").as("action"),
        floor(col("value") * lit(100) + lit(0.5)).cast(LongType).as("r_u"))
      .groupBy("seg", "action")
      .agg(count(lit(1)).as("n_sa"),
        sum(expr("CAST(r_u AS DECIMAL(38,0))")).as("r_sa"))
      .localCheckpoint(true) // ≤ 20 rows: feeds best-pick AND values
    val best = cells.withColumn("rk", row_number().over(
      Window.partitionBy("seg").orderBy(col("r_sa").desc, col("action"))))
      .where(col("rk") === 1)
      .select(col("seg"), col("action").as("best_action"))
    cells.join(broadcast(best), "seg")
      .groupBy("seg", "best_action").agg(
        sum(col("n_sa")).as("n_s"),
        sum(col("r_sa")).as("r_s"),
        sum(expr("r_sa * CASE WHEN action = best_action THEN 800000" +
          " ELSE 50000 END div n_sa")).as("v_target_ppm"))
      .select(col("seg"), col("n_s"), col("best_action"),
        expr("CAST(r_s * 1000000 div n_s AS BIGINT)").as("v_logged_ppm"),
        col("v_target_ppm"),
        (col("v_target_ppm") -
          expr("CAST(r_s * 1000000 div n_s AS BIGINT)")).as("lift_ppm"))
      .orderBy("seg")
  }

  private val q329Oracle: String =
    """WITH cells AS (SELECT user_id % 4 AS seg, event_type AS action,
      |    count(*) AS n_sa,
      |    sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS r_sa
      |  FROM events GROUP BY 1, 2),
      |best AS (SELECT seg, action AS best_action FROM (
      |    SELECT seg, action, row_number() OVER (PARTITION BY seg
      |      ORDER BY r_sa DESC, action) AS rk FROM cells) WHERE rk = 1)
      |SELECT seg, CAST(sum(n_sa) AS BIGINT) AS n_s, best_action,
      |  CAST(sum(r_sa) * 1000000 // sum(n_sa) AS BIGINT) AS v_logged_ppm,
      |  CAST(sum(r_sa * CASE WHEN action = best_action THEN 800000
      |    ELSE 50000 END // n_sa) AS BIGINT) AS v_target_ppm,
      |  CAST(sum(r_sa * CASE WHEN action = best_action THEN 800000
      |      ELSE 50000 END // n_sa)
      |    - sum(r_sa) * 1000000 // sum(n_sa) AS BIGINT) AS lift_ppm
      |FROM cells JOIN best USING (seg) GROUP BY seg, best_action
      |ORDER BY seg""".stripMargin

  // -- q330: Herfindahl-Hirschman revenue concentration ------------------------------
  // The market-concentration index per nation: HHI = Σ_i share_i² in
  // ppb (10000 points ≡ 1e7 ppb on the 0..1e9 grid), exactly — Σs_i²
  // and T² both ride DECIMAL(38,0)/HUGEINT so no share is ever a
  // float. Supplier dimension broadcasts into the lineitem scan; the
  // supplier-grain revenue frame is dimension-bounded.
  private def q330(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_suppkey").as("sk"),
        floor(col("l_extendedprice") * lit(100) + lit(0.5))
          .cast(LongType).as("rev_u"))
    val sup = Tables.read(spark, sfDir, "supplier")
      .select(col("s_suppkey").as("sk"), col("s_nationkey").as("nk"))
    val nat = Tables.read(spark, sfDir, "nation")
      .select(col("n_nationkey").as("nk"), col("n_name"))
    li.join(broadcast(sup), "sk")
      .groupBy("nk", "sk").agg(sum(col("rev_u")).as("s_rev"))
      .groupBy("nk").agg(
        count(lit(1)).as("n_suppliers"),
        sum(col("s_rev")).as("t"),
        sum(expr("CAST(s_rev AS DECIMAL(38,0)) * s_rev")).as("ss"),
        max(col("s_rev")).as("mx"))
      .join(broadcast(nat), "nk")
      .select(col("n_name").as("nation"), col("n_suppliers"),
        col("t").as("rev_total_u"),
        expr("ss * 1000000000 div (CAST(t AS DECIMAL(38,0)) * t)")
          .as("hhi_ppb"),
        expr("mx * 1000000 div t").as("top_share_ppm"))
      .orderBy("nation")
  }

  private val q330Oracle: String =
    """WITH bysupp AS (SELECT s_nationkey AS nk, l_suppkey AS sk,
      |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS s_rev
      |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey GROUP BY 1, 2),
      |agg AS (SELECT nk, count(*) AS n_suppliers,
      |    CAST(sum(s_rev) AS BIGINT) AS t,
      |    sum(CAST(s_rev AS HUGEINT) * s_rev) AS ss,
      |    max(s_rev) AS mx FROM bysupp GROUP BY 1)
      |SELECT n_name AS nation, CAST(n_suppliers AS BIGINT) AS n_suppliers,
      |  t AS rev_total_u,
      |  CAST(ss * 1000000000 // (CAST(t AS HUGEINT) * t) AS BIGINT)
      |    AS hhi_ppb,
      |  CAST(mx * 1000000 // t AS BIGINT) AS top_share_ppm
      |FROM agg JOIN nation ON nk = n_nationkey ORDER BY nation""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q327_autocorr_diagnostics", q327, Some(q327Oracle)),
    QueryDef("q328_gzip_metadata", q328, Some(q328Oracle)),
    QueryDef("q329_ips_policy_eval", q329, Some(q329Oracle)),
    QueryDef("q330_hhi_concentration", q330, Some(q330Oracle)),
  )
}
