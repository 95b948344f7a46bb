package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 eighth wave: backtested seasonal forecasting, event-path
  * mining, and Wilson-bound ranking.
  */
object Round10hQueries {

  // -- q175: seasonal forecast with honest backtest --------------------------
  // The simplest forecasting contract, evaluated the only honest way:
  // fit per-day-of-week mean revenue on days BEFORE the cutoff,
  // predict every day after it, and report the out-of-sample MAE next
  // to the global-mean baseline's. Predictions are exact floor-divided
  // integer means, so the whole backtest is BIGINT. TPC-H days are
  // iid, so the dow model's edge over the baseline is the calibrated
  // ~zero a forecaster must NOT overclaim — the eval shape is the
  // deliverable.
  private val FcCutoff = "2000-01-01"

  private def q175(spark: SparkSession, sfDir: String): DataFrame = {
    val daily = Tables.read(spark, sfDir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
        .as("rev_u"))
      .withColumn("dow", weekday(col("day")) + 1)
      .localCheckpoint(true) // train stats AND test scoring
    val train = daily.where(col("day") < lit(FcCutoff).cast("date"))
    val dowModel = train.groupBy("dow")
      .agg(expr("sum(rev_u) div count(1)").as("pred_dow_u"))
    val globalModel = train.agg(
      expr("sum(rev_u) div count(1)").as("pred_glob_u"))
    daily.where(col("day") >= lit(FcCutoff).cast("date"))
      .join(broadcast(dowModel), "dow")
      .crossJoin(broadcast(globalModel))
      .agg(count(lit(1)).as("n_test_days"),
        expr("sum(abs(rev_u - pred_dow_u)) div count(1)").as("mae_dow_u"),
        expr("sum(abs(rev_u - pred_glob_u)) div count(1)").as("mae_glob_u"))
      .select(col("n_test_days"), col("mae_dow_u"), col("mae_glob_u"),
        (col("mae_dow_u") < col("mae_glob_u")).as("dow_model_wins"))
  }

  private val q175Oracle: String =
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
       |      AS rev_u,
       |    isodow(CAST(o_orderdate AS DATE)) AS dow
       |  FROM orders GROUP BY 1),
       |train AS (SELECT * FROM daily WHERE day < DATE '$FcCutoff'),
       |dm AS (SELECT dow, CAST(sum(rev_u) // count(*) AS BIGINT) AS pred_dow_u
       |  FROM train GROUP BY 1),
       |gm AS (SELECT CAST(sum(rev_u) // count(*) AS BIGINT) AS pred_glob_u
       |  FROM train)
       |SELECT count(*) AS n_test_days,
       |  CAST(sum(abs(rev_u - pred_dow_u)) // count(*) AS BIGINT) AS mae_dow_u,
       |  CAST(sum(abs(rev_u - pred_glob_u)) // count(*) AS BIGINT) AS mae_glob_u,
       |  CAST(sum(abs(rev_u - pred_dow_u)) // count(*) AS BIGINT)
       |    < CAST(sum(abs(rev_u - pred_glob_u)) // count(*) AS BIGINT)
       |    AS dow_model_wins
       |FROM daily JOIN dm USING (dow) CROSS JOIN gm
       |WHERE day >= DATE '$FcCutoff'""".stripMargin

  // -- q176: event-path census (sequence mining lite) ------------------------
  // The "how do sessions start" question: each user's first three
  // event types (by time, event-id tiebreak) concatenated into a path
  // string, census of the top-20 paths. The per-user fold is
  // conditional aggregation over a rank-limited frame — no
  // collect_list ordering hazards, no per-user state.
  private val PathK = 3
  private val PathTopK = 20

  private def q176(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val ranked = Tables.read(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= PathK)
    val paths = ranked.groupBy("user_id")
      .agg(concat_ws(">",
        (1 to PathK).map(i =>
          max(when(col("rn") === i, col("event_type")))): _*).as("path"))
    paths.groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(PathTopK)
  }

  private val q176Oracle: String =
    s"""WITH ranked AS (SELECT user_id, event_type,
       |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
       |  FROM events),
       |paths AS (SELECT user_id, concat_ws('>',
       |    ${(1 to PathK).map(i =>
            s"max(CASE WHEN rn = $i THEN event_type END)").mkString(",\n    ")}
       |  ) AS path
       |  FROM ranked WHERE rn <= $PathK GROUP BY 1)
       |SELECT path, count(*) AS n_users FROM paths
       |GROUP BY 1 ORDER BY n_users DESC, path LIMIT $PathTopK""".stripMargin

  // -- q177: Wilson lower-bound ranking --------------------------------------
  // The rating-ranking classic (rank by the 95% Wilson score lower
  // bound, not the raw rate — small samples must not outrank large
  // ones): per part brand, the high-quantity rate of its lineitems,
  // Wilson-bounded and top-10 ranked. The bound is ONE fixed double
  // expression over exact integer counts (the q121/q122 convention),
  // n4-gridded before the rank so the boundary is bit-stable.
  private val WilsonZ = 1.959963984540054 // Phi^-1(0.975), shared literal
  private val WilsonTopK = 10

  private def q177(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_partkey"), (col("l_quantity") >= 25).cast("long").as("hi"))
    val byBrand = li
      .join(Tables.read(spark, sfDir, "part")
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("hi")).as("k"))
    val z = lit(WilsonZ)
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val lb = (p + z * z / (lit(2d) * nD) -
      z * sqrt(p * (lit(1d) - p) / nD + z * z / (lit(4d) * nD * nD))) /
      (lit(1d) + z * z / nD)
    byBrand
      .select(col("p_brand"), col("n"), col("k"),
        Norm.n4(lb).as("wilson_lb_n4"))
      .orderBy(col("wilson_lb_n4").desc, col("p_brand"))
      .limit(WilsonTopK)
  }

  private val q177Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    val z = s"CAST('$WilsonZ' AS DOUBLE)"
    val p = "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))"
    val nD = "CAST(n AS DOUBLE)"
    val lb = s"(($p + $z * $z / (2.0 * $nD) - $z * sqrt($p * (1.0 - $p) / $nD" +
      s" + $z * $z / (4.0 * $nD * $nD))) / (1.0 + $z * $z / $nD))"
    s"""WITH b AS (SELECT p_brand, count(*) AS n,
       |    CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS k
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1)
       |SELECT p_brand, n, k, ${n4(lb)} AS wilson_lb_n4
       |FROM b ORDER BY wilson_lb_n4 DESC, p_brand LIMIT $WilsonTopK""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q175_forecast_backtest", q175, Some(q175Oracle)),
    QueryDef("q176_path_census", q176, Some(q176Oracle)),
    QueryDef("q177_wilson_topk", q177, Some(q177Oracle)))
}
