package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.ops.{GraphOps, MixOps, TextOps}

/** Round-11 sixteenth wave: HITS hubs/authorities, classifier
  * calibration (reliability bins, Brier, ECE), and split-conformal
  * prediction intervals.
  */
object Round11pQueries {

  // -- q233: HITS over the trade graph ---------------------------------------
  // The second classic link-analysis fixed point (q108's PageRank is
  // the first): customers are hubs, suppliers authorities on the
  // distinct (custkey → suppkey) trade edges. Integer L1-normalized
  // half-steps (GraphOps.hits) make all three iterations bit-exact on
  // both engines; per iteration the cost is one src-keyed and one
  // dst-keyed edge shuffle plus two broadcast one-row totals — the
  // Pregel shape, no driver-side graph state.
  private def q233(spark: SparkSession, sfDir: String): DataFrame = {
    val edges = Tables.read(spark, sfDir, "orders")
      .join(Tables.read(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()
    GraphOps.hits(edges)
  }

  private val q233Oracle: String = GraphOps.hitsSql(
    """SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey""".stripMargin)

  // -- q234: classifier calibration (reliability bins, Brier, ECE) -----------
  // The ML-eval question every score-as-probability shortcut begs:
  // q16's quality score embeds an English-stopword ratio, so teams
  // WILL read it as P(lang=en) — is it calibrated? Deciles of the
  // score (reliability-diagram cells) with exact mean-confidence and
  // observed-rate micro-units, the global Brier score, and the
  // expected calibration error answer with numbers. The score lands
  // on the 1e-4 grid first, so every moment is integer: Brier*1e6 =
  // SUM((p_u - 10^4 y)^2) div (100*N), ECE*1e6 = SUM_b n_b*|conf_b -
  // obs_b| div N - bit-exact cross-engine, no order-sensitive double
  // sums. One scan feeds the decile census; everything after is
  // <= 10-row algebra on broadcast frames.
  private def q234(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.read(spark, sfDir, "documents")
      .where(TextOps.nTokens(col("text")) > 0)
      .select(
        floor(TextOps.qualityScore(col("text")) * 10000 + lit(0.5))
          .cast(LongType).as("p_u"),
        (col("lang") === "en").cast(LongType).as("y"))
      .localCheckpoint(true) // feeds the decile census and the moments
    val bins = base
      .groupBy(least(expr("p_u div 1000"), lit(9L)).as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("p_u")).as("__sp"),
        sum(col("y")).as("__sy"))
      .select(col("bin"), col("n"),
        expr("__sp * 100 div n").as("conf_u"),
        expr("__sy * 1000000 div n").as("obs_u"))
    val glob = base.agg(count(lit(1)).as("__nn"),
        sum((col("p_u") - lit(10000L) * col("y")) *
          (col("p_u") - lit(10000L) * col("y"))).as("__s"))
      .select(col("__nn"), expr("__s div (100 * __nn)").as("brier_u"))
    val ece = bins.crossJoin(broadcast(glob))
      .agg(sum(col("n") * abs(col("conf_u") - col("obs_u"))).as("__e"),
        first(col("__nn")).as("__nn"))
      .select(expr("__e div __nn").as("ece_u"))
    bins.crossJoin(broadcast(glob.select(col("brier_u"))))
      .crossJoin(broadcast(ece))
      .orderBy("bin")
  }

  private val q234Oracle: String =
    s"""WITH base AS (
       |  SELECT CAST(floor((${TextOps.qualityScoreSql("text")}) * 10000
       |      + 0.5) AS BIGINT) AS p_u,
       |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
       |  FROM documents WHERE ${TextOps.nTokensSql("text")} > 0),
       |bins AS (SELECT least(p_u // 1000, 9) AS bin, count(*) AS n,
       |    CAST(sum(p_u) AS HUGEINT) AS sp, CAST(sum(y) AS HUGEINT) AS sy
       |  FROM base GROUP BY 1),
       |bins2 AS (SELECT bin, n,
       |    CAST(sp * 100 // n AS BIGINT) AS conf_u,
       |    CAST(sy * 1000000 // n AS BIGINT) AS obs_u
       |  FROM bins),
       |gb AS (SELECT count(*) AS nn,
       |    CAST(sum(CAST(p_u - 10000 * y AS HUGEINT)
       |      * (p_u - 10000 * y)) // (100 * count(*)) AS BIGINT) AS brier_u
       |  FROM base),
       |ece AS (SELECT CAST(sum(CAST(n AS HUGEINT)
       |      * abs(conf_u - obs_u)) // any_value(gb.nn) AS BIGINT) AS ece_u
       |  FROM bins2 CROSS JOIN gb)
       |SELECT bin, n, conf_u, obs_u, gb.brier_u, ece.ece_u
       |FROM bins2 CROSS JOIN gb CROSS JOIN ece
       |ORDER BY bin""".stripMargin

  // -- q235: split-conformal prediction interval -----------------------------
  // The distribution-free uncertainty wrapper every model-serving
  // pipeline bolts on: a deterministic hash split (two-round portable
  // hash, q213's discipline) carves orders into a calibration and a
  // test half; the "model" is the calibration half's exact per-
  // priority integer mean; the conformal radius is the 0.9 exact
  // interpolated quantile of calibration |residual|s (the asymptotic
  // split-conformal form — the finite-sample (1+1/n) level inflation
  // is a O(1/n) refinement documented here, not applied, to keep the
  // percentile level foldable); empirical test-half coverage rides
  // along as the honesty check. Scale shape: one scan feeds the
  // split + the 5-row broadcast mean frame; the residual frame is
  // checkpointed once and serves both the quantile and the coverage
  // fold. A test-half group absent from the calibration half has no
  // model — the inner join drops it identically on both engines.
  private val CfSeed = 77L

  private def q235(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.read(spark, sfDir, "orders")
      .select(floor(col("o_totalprice")).cast(LongType).as("x"),
        col("o_orderpriority").as("g"),
        (MixOps.portableHash2(col("o_orderkey"), CfSeed) % 2).as("split"))
    val meansA = base.where(col("split") === 0)
      .groupBy("g").agg(sum(col("x")).as("__s"), count(lit(1)).as("__n"))
      .select(col("g"), expr("__s div __n").as("m"))
    val resid = base.join(broadcast(meansA), "g")
      .select(col("split"), abs(col("x") - col("m")).as("r"))
      .localCheckpoint(true) // feeds the quantile and the coverage fold
    val qhat = resid.where(col("split") === 0)
      .agg(count(lit(1)).as("n_cal"),
        Norm.n4(element_at(percentile(col("r"), array(lit(0.9))), 1))
          .as("qhat4"))
    resid.where(col("split") === 1)
      .crossJoin(broadcast(qhat))
      .agg(first(col("n_cal")).as("n_cal"), count(lit(1)).as("n_test"),
        first(col("qhat4")).as("qhat4"),
        sum(when(col("r").cast(DoubleType) <= col("qhat4"), 1L)
          .otherwise(0L)).as("__cov"))
      .select(col("n_cal"), col("n_test"), col("qhat4"),
        expr("__cov * 1000000 div n_test").as("coverage_ppm"))
  }

  private val q235Oracle: String = {
    val h = s"((((o_orderkey % ${MixOps.P} + $CfSeed) * 48271) % ${MixOps.P} + 1) * 69621) % ${MixOps.P}"
    s"""WITH base AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS x,
       |    o_orderpriority AS g, ($h) % 2 AS split
       |  FROM orders),
       |ma AS (SELECT g, CAST(sum(x) // count(*) AS BIGINT) AS m
       |  FROM base WHERE split = 0 GROUP BY 1),
       |resid AS (SELECT split, abs(x - m) AS r
       |  FROM base JOIN ma USING (g)),
       |qh AS (SELECT count(*) AS n_cal,
       |    ${graft.etl.OracleSql.n4("quantile_cont(r, 0.9)")} AS qhat4
       |  FROM resid WHERE split = 0)
       |SELECT qh.n_cal, count(*) AS n_test, qh.qhat4,
       |  CAST(sum(CASE WHEN CAST(r AS DOUBLE) <= qh.qhat4
       |      THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
       |    AS coverage_ppm
       |FROM resid CROSS JOIN qh
       |WHERE split = 1
       |GROUP BY qh.n_cal, qh.qhat4""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q233_hits_rank", q233, Some(q233Oracle)),
    QueryDef("q234_calibration", q234, Some(q234Oracle)),
    QueryDef("q235_conformal", q235, Some(q235Oracle)))
}
