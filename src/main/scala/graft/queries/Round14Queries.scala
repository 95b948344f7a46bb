package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.SpatialOps

/** Round-14 first wave — the VERDICT r13 scale switches made real:
  *
  *  - q378/q379: the density-adaptive spatial grid (VERDICT #5) as
  *    always-on queries under the SAME DuckDB oracles as q347/q357 —
  *    the full-disk neighbor mass rides a cell census, only the
  *    radius-boundary ring is enumerated point-level (SpatialOps).
  *  - q380: q322's documented-but-prose-only 100 TB switch (VERDICT
  *    #6): DAU/WAU/MAU from MERGEABLE per-day HLL sketches
  *    (hll_sketch_agg / hll_union_agg) — the trailing windows expand
  *    over n_days*30 SKETCH rows instead of 30x the (day, user)
  *    census, with the q188-style est-within-5%-of-exact gate so a
  *    drifting sketch fails the driver hash at whichever SF it
  *    drifts.
  */
object Round14Queries {

  // Same synthetic point cloud as q347/q357 (two LCG hops per axis on
  // the customer key) — the adaptive queries must agree with the
  // legacy oracles bit-for-bit, so the generator is repeated verbatim.
  private def points(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "customer")
      .selectExpr("c_custkey AS id",
        "((((c_custkey*1103515245 + 12345) % 2147483648) * 1103515245" +
          " + 54321) % 2147483648) % 100000 AS x",
        "((((c_custkey*69069 + 1) % 2147483648) * 69069 + 777)" +
          " % 2147483648) % 100000 AS y")

  private val SpatialR = 4000L
  private val DbMinPts = 4L

  private def q378(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = points(spark, sfDir).localCheckpoint(true)
    SpatialOps.dbscanCensus(pts, SpatialR, DbMinPts,
      SpatialOps.adaptiveSide(pts, SpatialR))
  }

  private def q379(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = points(spark, sfDir).localCheckpoint(true)
    SpatialOps.spatialKnn(pts, SpatialR,
      SpatialOps.adaptiveSide(pts, SpatialR), 3)
  }

  // -- q380: DAU/WAU/MAU via mergeable HLL day-sketches --------------------------
  // q322's scale switch: one HLL sketch per day (tiny, mergeable —
  // the Datasketches property that makes trailing-window DISTINCT
  // cheap at 100 TB), unioned over the trailing 7/30 days per target
  // day. The expansion is n_days x 30 SKETCH rows, never 30x the
  // (day, user) census. DAU plus the wau/mau exact sides are
  // recomputed exactly for the gate; output values are exact counts
  // and booleans only, so the driver hash is sketch-stable.
  private val HllTolPct = 5L

  private def q380(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.read(spark, sfDir, "events")
      .select(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast(LongType).as("day"), col("user_id"))
    val pairs = events.distinct()
      .localCheckpoint(true) // exact census: dau + both exact windows
    val bound = pairs.agg(max(col("day")).as("dmax"))
    // per-day sketch census: |days| rows of ~KB sketches
    val daySk = events.groupBy("day")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .localCheckpoint(true) // feeds both window expansions
    def rollSketch(win: Int, name: String): DataFrame = daySk
      .select(explode(sequence(col("day"), col("day") + (win - 1)))
        .as("day"), col("sk"))
      .crossJoin(broadcast(bound))
      .where(col("day") <= col("dmax"))
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as(name))
    def rollExact(win: Int, name: String): DataFrame = pairs
      .select(explode(sequence(col("day"), col("day") + (win - 1)))
        .as("day"), col("user_id"))
      .crossJoin(broadcast(bound))
      .where(col("day") <= col("dmax"))
      .groupBy("day").agg(countDistinct(col("user_id")).as(name))
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    def ok(est: String, exact: String): org.apache.spark.sql.Column =
      (abs(col(est) - col(exact)) * lit(100L) <=
        lit(HllTolPct) * col(exact)).as(s"${exact}_ok")
    dau
      .join(rollExact(7, "wau"), "day").join(rollExact(30, "mau"), "day")
      .join(rollSketch(7, "wau_est"), "day")
      .join(rollSketch(30, "mau_est"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        ok("wau_est", "wau"), ok("mau_est", "mau"))
      .orderBy("day")
  }

  private val q380Oracle: String =
    """WITH pairs AS (SELECT DISTINCT
      |    CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day,
      |    user_id
      |  FROM events),
      |b AS (SELECT max(day) AS dmax FROM pairs),
      |dau AS (SELECT day, count(*) AS dau FROM pairs GROUP BY 1),
      |wau AS (SELECT day, count(DISTINCT user_id) AS wau FROM (
      |    SELECT unnest(range(day, day + 7)) AS day, user_id
      |    FROM pairs), b WHERE day <= b.dmax GROUP BY 1),
      |mau AS (SELECT day, count(DISTINCT user_id) AS mau FROM (
      |    SELECT unnest(range(day, day + 30)) AS day, user_id
      |    FROM pairs), b WHERE day <= b.dmax GROUP BY 1)
      |SELECT day, dau, wau, mau, TRUE AS wau_ok, TRUE AS mau_ok
      |FROM dau JOIN wau USING (day) JOIN mau USING (day)
      |ORDER BY day""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q378_dbscan_adaptive", q378, Some(Round13kQueries.q347Oracle)),
    QueryDef("q379_knn_adaptive", q379, Some(Round13mQueries.q357Oracle)),
    QueryDef("q380_dau_hll", q380, Some(q380Oracle)),
  )
}
