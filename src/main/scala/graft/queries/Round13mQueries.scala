package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 thirteenth wave: weighted percentiles (q355 — quantity-
  * weighted order statistics from a value-grain census), the decile
  * migration matrix (q356 — year-over-year customer rank transitions),
  * grid-bounded spatial kNN (q357 — per-point nearest neighbors off
  * the q323 cell machinery), and the survey design effect (q358 —
  * intraclass correlation and DEFF from one-way ANOVA components).
  */
object Round13mQueries {

  // -- q355: weighted percentiles ---------------------------------------------------------
  // Order statistics where every row counts `quantity` times: the
  // (flag, value) census carries summed weights, the per-flag
  // cumulative runs over the VALUE-grain frame (bounded by distinct
  // prices, not rows), and each percentile is the smallest value whose
  // cumulative weight covers p·W — all integer comparisons, no
  // interpolation ambiguity.
  private def q355(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)").as("v"),
        expr("CAST(l_quantity AS BIGINT)").as("w"))
      .groupBy("flag", "v").agg(sum(col("w")).as("sw"))
    val w = Window.partitionBy("flag").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = census.withColumn("cw", sum(col("sw")).over(w))
    val tot = census.groupBy("flag").agg(sum(col("sw")).as("tw"))
    def pick(p: Long, name: String) =
      min(when(col("cw") * 1000000L >= col("tw") * p, col("v"))).as(name)
    cum.join(broadcast(tot), "flag")
      .groupBy("flag", "tw")
      .agg(pick(250000L, "wp25"), pick(500000L, "wp50"),
        pick(750000L, "wp75"))
      .select(col("flag"), col("tw").as("total_weight"),
        col("wp25"), col("wp50"), col("wp75"))
      .orderBy("flag")
  }

  private val q355Oracle: String =
    """WITH census AS (SELECT l_returnflag AS flag,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
      |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sw
      |  FROM lineitem GROUP BY 1, 2),
      |cum AS (SELECT flag, v, sw,
      |    CAST(sum(sw) OVER (PARTITION BY flag ORDER BY v
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw FROM census),
      |tot AS (SELECT flag, CAST(sum(sw) AS BIGINT) AS tw FROM census
      |  GROUP BY 1)
      |SELECT flag, tw AS total_weight,
      |  min(CASE WHEN cw * 1000000 >= tw * 250000 THEN v END) AS wp25,
      |  min(CASE WHEN cw * 1000000 >= tw * 500000 THEN v END) AS wp50,
      |  min(CASE WHEN cw * 1000000 >= tw * 750000 THEN v END) AS wp75
      |FROM cum JOIN tot USING (flag) GROUP BY flag, tw
      |ORDER BY flag""".stripMargin

  // -- q356: decile migration matrix ------------------------------------------------------
  // The rank-mobility census: customers decile by revenue within each
  // of two years (ntile over a TOTAL order among that year's buyers),
  // full-outer joined into (from, to) transition cells — decile 0
  // encodes "absent that year". The only row-sized work is two
  // key censuses; ranks live on customer-grain frames.
  private val MigY0 = 1996
  private val MigY1 = 1997

  private def q356(spark: SparkSession, sfDir: String): DataFrame = {
    // deciles via the bucketed global-ntile (round 16): the customer
    // domain grows with data scale, so the former unpartitioned
    // `ntile OVER (ORDER BY rev DESC)` was a single-task sort
    def yearRev(y: Int) = graft.ops.LayoutOps.globalNtile(
      Tables.read(spark, sfDir, "orders")
        .where(expr(s"year(o_orderdate) = $y"))
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("rev")),
      "rev", "ck", 10, "d", desc = true)
    yearRev(MigY0).select(col("ck"), col("d").as("d0"))
      .join(yearRev(MigY1).select(col("ck"), col("d").as("d1")),
        Seq("ck"), "full_outer")
      .groupBy(coalesce(col("d0"), lit(0L)).as("from_decile"),
        coalesce(col("d1"), lit(0L)).as("to_decile"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_decile", "to_decile")
  }

  private val q356Oracle: String =
    s"""WITH y0 AS (SELECT o_custkey AS ck,
       |    ntile(10) OVER (ORDER BY sum(CAST(floor(o_totalprice * 100
       |      + 0.5) AS BIGINT)) DESC, o_custkey) AS d0
       |  FROM orders WHERE year(o_orderdate) = $MigY0 GROUP BY 1),
       |y1 AS (SELECT o_custkey AS ck,
       |    ntile(10) OVER (ORDER BY sum(CAST(floor(o_totalprice * 100
       |      + 0.5) AS BIGINT)) DESC, o_custkey) AS d1
       |  FROM orders WHERE year(o_orderdate) = $MigY1 GROUP BY 1)
       |SELECT CAST(coalesce(d0, 0) AS BIGINT) AS from_decile,
       |  CAST(coalesce(d1, 0) AS BIGINT) AS to_decile, count(*) AS n
       |FROM y0 FULL OUTER JOIN y1 USING (ck)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q357: grid-bounded spatial kNN -----------------------------------------------------
  // The kNN join, grid-blocked: candidates come from the 9-cell
  // neighborhood (so k-nearest is DEFINED as "among neighbors within
  // R" — the bounded-radius contract every grid index has), ranked
  // per point by (distance, id) and cut at 3. Zero-neighbor points
  // survive via a left join with NULL neighbor fields.
  private val KnnR = 4000L

  private def q357(spark: SparkSession, sfDir: String): DataFrame = {
    val r2 = KnnR * KnnR
    val pts = Tables.read(spark, sfDir, "customer")
      .selectExpr("c_custkey AS id",
        "((((c_custkey*1103515245 + 12345) % 2147483648) * 1103515245" +
          " + 54321) % 2147483648) % 100000 AS x",
        "((((c_custkey*69069 + 1) % 2147483648) * 69069 + 777)" +
          " % 2147483648) % 100000 AS y")
      .withColumn("cx", expr(s"x div $KnnR"))
      .withColumn("cy", expr(s"y div $KnnR"))
      .localCheckpoint(true)
    // DEFAULT dispatch = the density probe (round 15, VERDICT r14 #1):
    // cell side < R from adaptiveSide means the adaptive grid pays —
    // run it (bit-identical, same oracle, q379's unconditional path);
    // side == R keeps the legacy 3x3 join. graft.spatial.legacy=true
    // opts OUT (the opt-IN graft.spatial.adaptive knob is retired) —
    // checked BEFORE the probe (ADVICE r15) so the opt-out also
    // bypasses adaptiveSide's coordinate require and its extra scan.
    val p3 = pts.select("id", "x", "y")
    if (!sys.props.get("graft.spatial.legacy").contains("true")) {
      val side = graft.ops.SpatialOps.adaptiveSide(p3, KnnR)
      if (side < KnnR)
        return graft.ops.SpatialOps.spatialKnn(p3, KnnR, side, 3)
    }
    val home = pts.select(col("id").as("idb"), col("x").as("xb"),
      col("y").as("yb"), (col("cx") * lit(1024L) + col("cy")).as("cell"))
    val offs = array(lit(-1L), lit(0L), lit(1L))
    val ex = pts
      .withColumn("dx", explode(offs))
      .withColumn("dy", explode(offs))
      .select(col("id").as("ida"), col("x").as("xa"), col("y").as("ya"),
        ((col("cx") + col("dx")) * lit(1024L) + col("cy") + col("dy"))
          .as("cell"))
    val ranked = ex.join(home, "cell")
      .where(col("ida") =!= col("idb"))
      .select(col("ida"), col("idb"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
      .where(col("d2") <= lit(r2))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("ida")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("ida").orderBy(col("d2"), col("idb"))))
      .where(col("rk") <= 3)
    val agg = ranked.groupBy(col("ida")).agg(
      max(col("cnt")).as("n_within"),
      max(when(col("rk") === 1, col("idb"))).as("nn1_id"),
      min(col("d2")).as("nn1_d2"),
      expr("sum(d2) * 1000 div count(*)").as("knn3_avg_d2_milli"))
    pts.select(col("id")).join(agg, col("id") === col("ida"), "left")
      .select(col("id"), coalesce(col("n_within"), lit(0L)).as("n_within"),
        col("nn1_id"), col("nn1_d2"), col("knn3_avg_d2_milli"))
      .orderBy("id")
  }

  private[queries] val q357Oracle: String = {
    val r2 = KnnR * KnnR
    s"""WITH h AS (SELECT c_custkey AS id,
       |    (c_custkey*1103515245 + 12345) % 2147483648 AS h1,
       |    (c_custkey*69069 + 1) % 2147483648 AS g1 FROM customer),
       |pts AS (SELECT id,
       |    ((h1*1103515245 + 54321) % 2147483648) % 100000 AS x,
       |    ((g1*69069 + 777) % 2147483648) % 100000 AS y FROM h),
       |p2 AS (SELECT id, x, y, x // $KnnR AS cx, y // $KnnR AS cy FROM pts),
       |off AS (SELECT * FROM (VALUES (-1),(0),(1)) o(d)),
       |ex AS (SELECT id AS ida, x AS xa, y AS ya,
       |    (cx+ox.d)*1024 + (cy+oy.d) AS cell FROM p2, off ox, off oy),
       |hm AS (SELECT id AS idb, x AS xb, y AS yb, cx*1024 + cy AS cell
       |  FROM p2),
       |pr AS (SELECT ida, idb,
       |    (xa-xb)*(xa-xb)+(ya-yb)*(ya-yb) AS d2
       |  FROM ex JOIN hm USING (cell)
       |  WHERE ida <> idb AND (xa-xb)*(xa-xb)+(ya-yb)*(ya-yb) <= $r2),
       |ranked AS (SELECT *,
       |    count(*) OVER (PARTITION BY ida) AS cnt,
       |    row_number() OVER (PARTITION BY ida ORDER BY d2, idb) AS rk
       |  FROM pr),
       |agg AS (SELECT ida, max(cnt) AS n_within,
       |    max(CASE WHEN rk = 1 THEN idb END) AS nn1_id,
       |    min(d2) AS nn1_d2,
       |    CAST(sum(d2) * 1000 // count(*) AS BIGINT) AS knn3_avg_d2_milli
       |  FROM ranked WHERE rk <= 3 GROUP BY 1)
       |SELECT id, coalesce(n_within, 0) AS n_within, nn1_id, nn1_d2,
       |  knn3_avg_d2_milli
       |FROM p2 LEFT JOIN agg ON id = ida ORDER BY id""".stripMargin
  }

  // -- q358: survey design effect ---------------------------------------------------------
  // Cluster-sampling diagnostics: users are the clusters, event values
  // the observations; one-way ANOVA components give MSB/MSW, the
  // unbalanced average cluster size m0 = (N − Σn_i²/N)/(k−1), the
  // intraclass correlation ICC = (MSB−MSW)/(MSB+(m0−1)·MSW) and the
  // design effect DEFF = 1 + (m0−1)·ICC — the factor by which
  // clustering inflates the variance of a mean. All components are
  // per-term trunc-div integers off ONE user census; the signed ICC
  // numerator rides the sign-safe pattern.
  private def q358(spark: SparkSession, sfDir: String): DataFrame = {
    val users = Tables.read(spark, sfDir, "events")
      .select(col("user_id").as("u"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("y"))
      .groupBy("u").agg(count(lit(1)).as("n"),
        sum(expr("CAST(y AS DECIMAL(38,0))")).as("s"),
        sum(expr("CAST(y AS DECIMAL(38,0)) * y")).as("q"))
    users.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("s")).as("ss"), sum(col("q")).as("qq"),
      sum(expr("s * s div n")).as("tb"),
      sum(expr("CAST(n AS DECIMAL(38,0)) * n")).as("n2"))
      .withColumn("ssb", expr("tb - ss * ss div nn"))
      .withColumn("ssw", expr("qq - tb"))
      .withColumn("msb", expr("ssb div (k - 1)"))
      .withColumn("msw", expr("ssw div (nn - k)"))
      .withColumn("m0_milli",
        expr("(nn - n2 div nn) * 1000 div (k - 1)"))
      .withColumn("icc_ppm", expr("CASE WHEN msb < msw" +
        " THEN -((msw - msb) * 1000000" +
        "   div nullif(msb + (m0_milli - 1000) * msw div 1000, 0))" +
        " ELSE (msb - msw) * 1000000" +
        "   div nullif(msb + (m0_milli - 1000) * msw div 1000, 0) END"))
      .withColumn("deff_milli", expr("CASE WHEN icc_ppm < 0" +
        " THEN 1000 - (m0_milli - 1000) * (-icc_ppm) div 1000000000" +
        " ELSE 1000 + (m0_milli - 1000) * icc_ppm div 1000000000 END"))
      .select(col("k").as("n_clusters"), col("nn").as("n_obs"),
        col("m0_milli"),
        expr("CAST(msb AS BIGINT)").as("msb_cents2"),
        expr("CAST(msw AS BIGINT)").as("msw_cents2"),
        col("icc_ppm"), col("deff_milli"))
  }

  private val q358Oracle: String =
    """WITH users AS (SELECT user_id AS u, count(*) AS n,
      |    sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT))
      |      AS s,
      |    sum(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS HUGEINT)
      |      * CAST(floor(value * 100 + 0.5) AS BIGINT)) AS q
      |  FROM events GROUP BY 1),
      |agg AS (SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nn,
      |    sum(s) AS ss, sum(q) AS qq,
      |    sum(s * s // n) AS tb,
      |    sum(CAST(n AS HUGEINT) * n) AS n2 FROM users),
      |d AS (SELECT k, nn, tb - ss * ss // nn AS ssb, qq - tb AS ssw,
      |    (nn - n2 // nn) * 1000 // (k - 1) AS m0_milli FROM agg),
      |m AS (SELECT k, nn, m0_milli, ssb // (k - 1) AS msb,
      |    ssw // (nn - k) AS msw FROM d),
      |i AS (SELECT *, CASE WHEN msb < msw
      |    THEN -((msw - msb) * 1000000
      |      // nullif(msb + (m0_milli - 1000) * msw // 1000, 0))
      |    ELSE (msb - msw) * 1000000
      |      // nullif(msb + (m0_milli - 1000) * msw // 1000, 0) END
      |    AS icc_ppm FROM m)
      |SELECT CAST(k AS BIGINT) AS n_clusters, nn AS n_obs,
      |  CAST(m0_milli AS BIGINT) AS m0_milli,
      |  CAST(msb AS BIGINT) AS msb_cents2, CAST(msw AS BIGINT) AS msw_cents2,
      |  CAST(icc_ppm AS BIGINT) AS icc_ppm,
      |  CAST(CASE WHEN icc_ppm < 0
      |    THEN 1000 - (m0_milli - 1000) * (-icc_ppm) // 1000000000
      |    ELSE 1000 + (m0_milli - 1000) * icc_ppm // 1000000000 END
      |    AS BIGINT) AS deff_milli
      |FROM i""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q355_weighted_median", q355, Some(q355Oracle)),
    QueryDef("q356_decile_migration", q356, Some(q356Oracle)),
    QueryDef("q357_spatial_knn", q357, Some(q357Oracle)),
    QueryDef("q358_design_effect", q358, Some(q358Oracle)),
  )
}
