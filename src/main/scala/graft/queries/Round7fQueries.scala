package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Round-7 seventh wave: experimentation and drift analytics — funnel
  * step-latency percentiles (composing q94's funnel), the pooled
  * two-proportion A/B z-test, and the two-sample Kolmogorov-Smirnov
  * drift statistic. Counts exact, percentiles in the q43 n4 parity
  * class, z/KS as fixed single-expression doubles (n4).
  */
object Round7fQueries {

  // -- q120: funnel step-latency percentiles -------------------------------
  // How long converting users take per step (p50/p90 of the µs gap),
  // over the same view→click→purchase funnel q94 verifies.
  private val FunnelSteps = Seq("view", "click", "purchase")
  private val FunnelDeadlineH = 6

  private def q120(spark: SparkSession, sfDir: String): DataFrame = {
    val f = EventOps.funnelSteps(Tables.read(spark, sfDir, "events"),
      "user_id", "ts", "event_type", FunnelSteps, FunnelDeadlineH)
    def leg(name: String, a: String, b: String): DataFrame =
      f.select(lit(name).as("step"), (col(b) - col(a)).as("lat"))
        .where(col("lat").isNotNull)
    leg("1_view_click", "t0_us", "t1_us")
      .unionAll(leg("2_click_purchase", "t1_us", "t2_us"))
      .groupBy("step")
      .agg(count(lit(1)).as("n"),
        Norm.n4(element_at(percentile(col("lat"), array(lit(0.5))), 1)).as("p50_us"),
        Norm.n4(element_at(percentile(col("lat"), array(lit(0.9))), 1)).as("p90_us"))
      .orderBy("step")
  }

  private val q120Oracle: String = {
    val f = EventOps.funnelStepsSql("user_id", "ts", "event_type",
      FunnelSteps, FunnelDeadlineH)
    s"""WITH d AS (
       |  SELECT '1_view_click' AS step, t1_us - t0_us AS lat
       |  FROM ($f) f WHERE t1_us IS NOT NULL
       |  UNION ALL
       |  SELECT '2_click_purchase', t2_us - t1_us
       |  FROM ($f) f2 WHERE t2_us IS NOT NULL)
       |SELECT step, count(*) AS n,
       |  ${OracleHelpers.n4("quantile_cont(lat, 0.5)")} AS p50_us,
       |  ${OracleHelpers.n4("quantile_cont(lat, 0.9)")} AS p90_us
       |FROM d GROUP BY step ORDER BY step""".stripMargin
  }

  // -- q121: A/B experiment z-statistic ------------------------------------
  // Variant by user-id parity (the deterministic assignment), success
  // = the event is a purchase; one scan, one z. Two DEGENERATE
  // scenarios ride along so the driver's hash gate locks in the
  // try_divide NULL-on-degenerate semantics (VERDICT r8 #6): an empty
  // variant A (user_id < 0 matches nothing → rate_a and z NULL) and a
  // zero-conversion pool (p̂ = 0 → zero-variance denominator → z NULL).
  private def q121(spark: SparkSession, sfDir: String): DataFrame =
    EvalOps.abTestZMulti(Tables.read(spark, sfDir, "events"), Seq(
      ("1_parity", col("user_id") % 2 === 0, col("event_type") === "purchase"),
      ("2_empty_a", col("user_id") < 0, col("event_type") === "purchase"),
      ("3_zero_conv", col("user_id") % 2 === 0,
        col("event_type") === "no_such_type")))

  private val q121Oracle: String = {
    def part(s: String, variant: String, conv: String): String =
      s"SELECT '$s' AS scenario, * FROM (\n" +
        EvalOps.abTestZSql("events", variant, conv) + "\n)"
    part("1_parity", "user_id % 2 = 0", "event_type = 'purchase'") +
      "\nUNION ALL\n" +
      part("2_empty_a", "user_id < 0", "event_type = 'purchase'") +
      "\nUNION ALL\n" +
      part("3_zero_conv", "user_id % 2 = 0", "event_type = 'no_such_type'") +
      "\nORDER BY scenario"
  }

  // -- q122: corpus drift (two-sample KS) ----------------------------------
  // Doc-length distribution drift between the even- and odd-id halves
  // of the corpus (stand-ins for two snapshots).
  private def q122(spark: SparkSession, sfDir: String): DataFrame =
    EvalOps.ksDrift(Tables.read(spark, sfDir, "documents"),
      col("doc_id") % 2 === 0, col("n_chars"))

  private val q122Oracle: String =
    EvalOps.ksDriftSql("documents", "doc_id % 2 = 0", "n_chars")

  // -- q123: int8 embedding quantization -----------------------------------
  private def q123(spark: SparkSession, sfDir: String): DataFrame =
    SimilarityOps.quantizeInt8(
      Tables.read(spark, sfDir, "embeddings"), "vec_id", "embedding")

  private val q123Oracle: String =
    SimilarityOps.quantizeInt8Sql("embeddings", "vec_id", "embedding")

  // -- q124: Kaplan-Meier fulfilment survival ------------------------------
  // Time-to-event = days from order date to the order's FIRST
  // shipment; every fifth order is right-censored at day 30 (the
  // deterministic stand-in for still-open orders): its event never
  // fires and it leaves the risk set at min(true latency, 30).
  private def q124(spark: SparkSession, sfDir: String): DataFrame = {
    val firstShip = Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("ship"))
    val obs = Tables.read(spark, sfDir, "orders")
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(datediff(to_date(col("ship")), to_date(col("o_orderdate")))
        .cast("long").as("dur"),
        (col("o_orderkey") % 5 =!= 0).as("evt"))
      .select(when(col("evt"), col("dur"))
        .otherwise(least(col("dur"), lit(30L))).as("time"), col("evt"))
    StatsOps.kaplanMeier(obs, "time", "evt")
  }

  private val q124Oracle: String = {
    val obs =
      """(SELECT CASE WHEN o_orderkey % 5 <> 0 THEN dur
        |            ELSE least(dur, 30) END AS time,
        |       o_orderkey % 5 <> 0 AS evt
        | FROM (SELECT o.o_orderkey, o.o_orderdate,
        |         CAST(datediff('day', CAST(o.o_orderdate AS DATE),
        |                       CAST(s.ship AS DATE)) AS BIGINT) AS dur
        |       FROM orders o JOIN (SELECT l_orderkey, min(l_shipdate) AS ship
        |                           FROM lineitem GROUP BY 1) s
        |         ON o.o_orderkey = s.l_orderkey))""".stripMargin
    StatsOps.kaplanMeierSql(obs, "time", "evt")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q120_funnel_latency", q120, Some(q120Oracle)),
    QueryDef("q121_ab_test", q121, Some(q121Oracle)),
    QueryDef("q122_ks_drift", q122, Some(q122Oracle)),
    QueryDef("q123_embed_quantize", q123, Some(q123Oracle)),
    QueryDef("q124_km_survival", q124, Some(q124Oracle)),
  )
}
