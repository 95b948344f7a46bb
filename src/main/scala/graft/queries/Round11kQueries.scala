package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.ops.{MixOps, MultimodalOps}

/** Round-11 eleventh wave: ISO-BMFF (MP4) nested box walk, the
  * rank-family analytic function suite, and CUPED variance-reduced
  * A/B measurement.
  */
object Round11kQueries {

  // -- q220: MP4 (ISO-BMFF) metadata census ----------------------------------
  // The fourth container family and the first NESTED one: PNG/WAV
  // read fixed offsets, JPEG walks a flat marker chain — ISO-BMFF
  // metadata sits two levels down (moov → mvhd), so the kernel must
  // recurse into box payloads with per-level bounds checks
  // (MultimodalKernels.mp4Meta). Payloads synthesize per part row
  // (varying timescale/duration/track-count; every 29th corrupt);
  // census by track count with duration re-based to ms — the oracle
  // recomputes from the generative parameters (the q198 discipline),
  // while Round11bSpec-style spec-literal units pin the byte layout.
  private def q220(spark: SparkSession, sfDir: String): DataFrame = {
    val payload = MultimodalOps.mp4Header(
      lit(600) + (col("p_partkey") % 3) * 300,
      col("p_partkey") % 100000 + 600,
      lit(1) + col("p_partkey") % 4,
      col("p_partkey") % 29 =!= 0)
    Tables.read(spark, sfDir, "part")
      .select(col("p_partkey"), payload.as("payload"))
      .select(MultimodalOps.mp4Meta(col("payload")).as("__m"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"))
      .select(
        when(col("__m").isNull, "INVALID")
          .otherwise(concat(lit("t"), col("__m").getItem(2))).as("tracks"),
        expr("__m[1] * 1000 div __m[0]").as("dms"),
        col("n_bytes"))
      .groupBy("tracks")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("dms"), lit(0L))).as("sum_duration_ms"),
        max(col("dms")).as("max_duration_ms"),
        sum(col("n_bytes")).as("sum_bytes"))
      .orderBy("tracks")
  }

  private val q220Oracle: String =
    """WITH p AS (SELECT p_partkey,
      |    600 + (p_partkey % 3) * 300 AS tsc,
      |    p_partkey % 100000 + 600 AS dur,
      |    1 + p_partkey % 4 AS trk,
      |    p_partkey % 29 <> 0 AS ok
      |  FROM part),
      |r AS (SELECT
      |    CASE WHEN NOT ok THEN 'INVALID'
      |         ELSE 't' || CAST(trk AS VARCHAR) END AS tracks,
      |    CASE WHEN ok THEN dur * 1000 // tsc END AS dms,
      |    145 + 16 * trk AS n_bytes
      |  FROM p)
      |SELECT tracks, count(*) AS n,
      |  CAST(sum(coalesce(dms, 0)) AS BIGINT) AS sum_duration_ms,
      |  max(dms) AS max_duration_ms,
      |  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q221: analytic-function suite -----------------------------------------
  // The §2.7 rank-family surface exercised head-on in ONE keyed
  // window pass: ntile quartiles, percent_rank and cume_dist on an
  // exact milli grid (both are exact rationals — the grid guards the
  // division, not the ranking), and nth_value under an explicit
  // running frame (its default-frame NULL behavior for rows before
  // the nth is part of the contract: the per-group min skips them).
  // Everything is partitioned by priority over a total (price, key)
  // order; output collapses to the (priority × quartile) census.
  private def q221(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("priority")
      .orderBy(col("pu").asc, col("o_orderkey").asc)
    val wr = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.read(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("priority"), col("o_orderkey"),
        floor(col("o_totalprice")).as("pu"))
      .select(col("priority"),
        ntile(4).over(w).cast(LongType).as("q4"),
        floor(percent_rank().over(w) * 1000 + lit(0.5)).cast(LongType)
          .as("prm"),
        floor(cume_dist().over(w) * 1000 + lit(0.5)).cast(LongType)
          .as("cdm"),
        nth_value(col("o_orderkey"), 2).over(wr).as("nth2"),
        col("pu"))
      .groupBy("priority", "q4")
      .agg(count(lit(1)).as("n"), sum(col("pu")).as("sum_price_u"),
        sum(col("prm")).as("sum_pr_milli"), sum(col("cdm")).as("sum_cd_milli"),
        min(col("nth2")).as("second_key"))
      .orderBy("priority", "q4")
  }

  private val q221Oracle: String =
    """WITH b AS (SELECT o_orderpriority AS priority, o_orderkey,
      |    CAST(floor(o_totalprice) AS BIGINT) AS pu
      |  FROM orders),
      |r AS (SELECT priority, pu,
      |    ntile(4) OVER w AS q4,
      |    CAST(floor(percent_rank() OVER w * 1000 + 0.5) AS BIGINT) AS prm,
      |    CAST(floor(cume_dist() OVER w * 1000 + 0.5) AS BIGINT) AS cdm,
      |    nth_value(o_orderkey, 2) OVER (PARTITION BY priority
      |      ORDER BY pu, o_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nth2
      |  FROM b
      |  WINDOW w AS (PARTITION BY priority ORDER BY pu, o_orderkey))
      |SELECT priority, q4, count(*) AS n,
      |  CAST(sum(pu) AS BIGINT) AS sum_price_u,
      |  CAST(sum(prm) AS BIGINT) AS sum_pr_milli,
      |  CAST(sum(cdm) AS BIGINT) AS sum_cd_milli,
      |  min(nth2) AS second_key
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q222: CUPED variance-reduced A/B --------------------------------------
  // The experimentation-platform workhorse: adjust each user's
  // post-period metric by their PRE-period metric (adj = y − θ(x −
  // x̄), θ = cov(x,y)/var(x) pooled) so variant means keep their
  // expectation but shed the variance pre-period behavior explains.
  // Exactness: x/y are integer unit sums; θ and x̄ come from ONE
  // division each of exact DECIMAL(38,0) sums cast once to DOUBLE
  // (the q102/corr discipline — both engines see bit-identical
  // operands); per-user adj lands on the 1e-4 grid immediately, so
  // every later sum is an integer sum. Variance-reduction ratio is
  // computed on the SAME grid for y and adj. Variant = two-round
  // portable hash of custkey. Scale shape: one custkey aggregate
  // (the only data shuffle), then one-row stats frames broadcast
  // back over the user frame — no window anywhere.
  private val CupedCutoff = "1998-01-01"
  private val CupedSeed = 83L

  private def q222(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val pre = col("o_orderdate") < lit(CupedCutoff).cast("timestamp")
    val users = Tables.read(spark, sfDir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(when(pre, floor(col("o_totalprice"))).otherwise(0L)).as("x"),
        sum(when(!pre, floor(col("o_totalprice"))).otherwise(0L)).as("y"))
      .withColumn("variant",
        when(MixOps.portableHash2(col("o_custkey"), CupedSeed) % 2 === 0, "A")
          .otherwise("B"))
      .localCheckpoint(true) // feeds theta fit, adj pass, and census
    val fit = users.agg(
      count(lit(1)).cast(dec).as("nn"),
      sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
      .select(
        ((col("nn") * col("sxy") - col("sx") * col("sy")).cast(DoubleType) /
          (col("nn") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
          .as("theta"),
        (col("sx").cast(DoubleType) / col("nn").cast(DoubleType)).as("xbar"))
    val adj = users.crossJoin(broadcast(fit))
      .select(col("o_custkey"), col("variant"), col("y"),
        floor((col("y").cast(DoubleType) - col("theta") *
          (col("x").cast(DoubleType) - col("xbar"))) * lit(10000.0)
          + lit(0.5)).cast(LongType).as("a4"),
        (col("y") * 10000L).as("y4"))
      .localCheckpoint(true) // feeds pooled variance AND variant census
    val pooled = adj.agg(
      count(lit(1)).cast(dec).as("pn"),
      sum(col("a4")).cast(dec).as("sa"), sum(col("y4")).cast(dec).as("sy4"),
      sum(col("a4").cast(dec) * col("a4").cast(dec)).as("saa"),
      sum(col("y4").cast(dec) * col("y4").cast(dec)).as("syy"))
      .select(graft.queries.Norm.n4(
        ((col("pn") * col("saa") - col("sa") * col("sa")).cast(DoubleType) /
          (col("pn") * col("syy") - col("sy4") * col("sy4")).cast(DoubleType)))
        .as("var_ratio"))
    adj.groupBy("variant")
      .agg(count(lit(1)).as("n_users"), sum(col("y")).as("__sy"),
        sum(col("a4")).as("__sa"))
      .crossJoin(broadcast(pooled))
      .select(col("variant"), col("n_users"),
        expr("__sy div n_users").as("mean_post_u"),
        expr("__sa div n_users").as("mean_adj_e4"),
        col("var_ratio"))
      .orderBy("variant")
  }

  private val q222Oracle: String = {
    val h = s"((((o_custkey % ${MixOps.P} + $CupedSeed) * 48271) % ${MixOps.P} + 1) * 69621) % ${MixOps.P}"
    s"""WITH u AS (SELECT o_custkey,
       |    CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '$CupedCutoff 00:00:00'
       |      THEN floor(o_totalprice) ELSE 0 END) AS BIGINT) AS x,
       |    CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '$CupedCutoff 00:00:00'
       |      THEN floor(o_totalprice) ELSE 0 END) AS BIGINT) AS y,
       |    CASE WHEN ($h) % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM orders GROUP BY 1),
       |fit AS (SELECT
       |    CAST(CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * y)
       |        - CAST(sum(x) AS HUGEINT) * sum(y) AS DOUBLE)
       |      / CAST(CAST(count(*) AS HUGEINT) * sum(CAST(x AS HUGEINT) * x)
       |        - CAST(sum(x) AS HUGEINT) * sum(x) AS DOUBLE) AS theta,
       |    CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS xbar
       |  FROM u),
       |adj AS (SELECT o_custkey, variant, y,
       |    CAST(floor((CAST(y AS DOUBLE) - fit.theta *
       |      (CAST(x AS DOUBLE) - fit.xbar)) * 10000.0 + 0.5) AS BIGINT) AS a4,
       |    y * 10000 AS y4
       |  FROM u CROSS JOIN fit),
       |pooled AS (SELECT
       |    ${graft.etl.OracleSql.n4(
      "CAST(CAST(count(*) AS HUGEINT) * sum(CAST(a4 AS HUGEINT) * a4) " +
        "- CAST(sum(a4) AS HUGEINT) * sum(a4) AS DOUBLE) " +
        "/ CAST(CAST(count(*) AS HUGEINT) * sum(CAST(y4 AS HUGEINT) * y4) " +
        "- CAST(sum(y4) AS HUGEINT) * sum(y4) AS DOUBLE)")} AS var_ratio
       |  FROM adj)
       |SELECT variant, count(*) AS n_users,
       |  CAST(sum(y) // count(*) AS BIGINT) AS mean_post_u,
       |  CAST(sum(a4) // count(*) AS BIGINT) AS mean_adj_e4,
       |  pooled.var_ratio
       |FROM adj CROSS JOIN pooled
       |GROUP BY variant, pooled.var_ratio
       |ORDER BY variant""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q220_mp4_metadata", q220, Some(q220Oracle)),
    QueryDef("q221_analytic_suite", q221, Some(q221Oracle)),
    QueryDef("q222_cuped_ab", q222, Some(q222Oracle)))
}
