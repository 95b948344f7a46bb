package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 ninth wave: preference queries (skyline), time-weighted
  * aggregation, and optimizer-style equi-depth column statistics.
  */
object Round10iQueries {

  // -- q178: 2-D skyline (Pareto frontier) -----------------------------------
  // The preference query: parts not dominated on (min price, max
  // size). The classic sweep — order by (price asc, size desc), keep
  // rows whose size strictly exceeds the running max of everything
  // before them — is O(n log n) but wants a GLOBAL ordered window, so
  // it runs two-level like q166: exact percentile cuts bucket the
  // price axis map-side, each bucket sweeps locally under its own
  // window, and the cross-bucket carry-in max arrives as a broadcast
  // prefix-max over the tiny per-bucket summary. Duplicate
  // (price,size) points collapse first so tie dominance is
  // unambiguous.
  private val SkyBuckets = 16

  private def q178(spark: SparkSession, sfDir: String): DataFrame = {
    val pts = Tables.read(spark, sfDir, "part")
      .select(floor(col("p_retailprice") * 100 + lit(0.5)).cast("long")
        .as("price_u"), col("p_size").cast("long").as("sz"))
      .distinct()
      .localCheckpoint(true) // feeds the cuts AND the sweep
    val fracs = (1 until SkyBuckets).map(_.toDouble / SkyBuckets)
    val cuts = pts.agg(percentile(col("price_u"),
      array(fracs.map(lit): _*)).as("__cuts"))
    val bucketed = pts.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until SkyBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col("price_u").cast("double") >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true) // bucket maxima AND the local sweeps
    // carry-in for bucket b = max size over all STRICTLY cheaper
    // buckets (a tiny SkyBuckets-row frame; its window is bounded by
    // the config constant)
    val carry = bucketed.groupBy("__bkt").agg(max(col("sz")).as("__bmax"))
      .withColumn("__carry",
        max(col("__bmax")).over(Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__bkt"), col("__carry"))
    val w = Window.partitionBy("__bkt")
      .orderBy(col("price_u").asc, col("sz").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(carry), "__bkt")
      .withColumn("__runmax",
        greatest(coalesce(max(col("sz")).over(w), lit(Long.MinValue)),
          coalesce(col("__carry"), lit(Long.MinValue))))
      .where(col("sz") > col("__runmax"))
      .select(col("price_u"), col("sz"))
      .orderBy("price_u")
  }

  private val q178Oracle: String =
    """WITH pts AS (SELECT DISTINCT
      |    CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_u,
      |    CAST(p_size AS BIGINT) AS sz
      |  FROM part),
      |sweep AS (SELECT price_u, sz,
      |    max(sz) OVER (ORDER BY price_u, sz DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS runmax
      |  FROM pts)
      |SELECT price_u, sz FROM sweep
      |WHERE runmax IS NULL OR sz > runmax
      |ORDER BY price_u""".stripMargin

  // -- q179: time-weighted average (TWAP) ------------------------------------
  // The financial/sensor aggregation a plain mean gets wrong: each
  // event's value is held until the user's NEXT event and weighted by
  // that holding time (exact epoch-microsecond integers; the final
  // value carries no duration, the standard convention). One per-user
  // window for the lead, one exact integer fold, one n4 division.
  private def q179(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val ev = Tables.read(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value") * 100 + lit(0.5)).cast("long").as("v_u"),
        unix_micros(col("ts")).as("t_us"))
      .withColumn("next_us", lead(col("t_us"), 1).over(w))
      .where(col("next_us").isNotNull)
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_held"),
        sum((col("next_us") - col("t_us")) * col("v_u")).as("__wsum"),
        sum(col("next_us") - col("t_us")).as("__tsum"))
      .select(col("user_id"), col("n_held"),
        Norm.n4(col("__wsum").cast("double") / col("__tsum").cast("double"))
          .as("twap_n4"))
      .orderBy("user_id")
  }

  private val q179Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH ev AS (SELECT user_id, event_id, ts,
       |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_u,
       |    epoch_us(ts) AS t_us,
       |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS next_us
       |  FROM events)
       |SELECT user_id, count(*) AS n_held,
       |  ${n4("CAST(sum((next_us - t_us) * v_u) AS DOUBLE) / " +
         "CAST(sum(next_us - t_us) AS DOUBLE)")} AS twap_n4
       |FROM ev WHERE next_us IS NOT NULL
       |GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  // -- q180: equi-depth column statistics (ANALYZE-style) --------------------
  // The histogram a cost-based optimizer actually keeps: 16 equi-depth
  // buckets over l_extendedprice (exact interpolated cut points — the
  // q43 parity class), per bucket the row count, exact bounds, and
  // exact NDV. Exactness is this query's contract (the P4 parity
  // class); the 100 TB scale path — GK-sketch cuts + HLL NDV — is
  // wired and gated as q188 (Round11Queries), per VERDICT r10 #2.
  //
  // Round-12 rework (the q228 lesson applied to multi-quantile): the
  // raw column collapses to a VALUE CENSUS in its one data-sized
  // shuffle, the 15 exact interpolated cuts come from the bucketed
  // rank machinery (Round12Queries.exactQuantiles — bit-identical to
  // quantile_cont, no single-reducer value map), and because the
  // census IS the dedup, n/lo/hi/NDV all fall out of ONE census-sized
  // aggregate — the old plan's second full-column pass and its
  // distinct exchange are gone (measured 4.9 s → see BASELINE.md).
  private val DepthBuckets = 16

  private def q180(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
        .as("v_u"))
      .groupBy("v_u").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true) // cuts machinery AND the bucket rollup
    val cuts = Round12Queries.exactQuantiles(census, "v_u", "cnt",
      DepthBuckets, 1 until DepthBuckets)
    census.crossJoin(broadcast(cuts.select("__cuts")))
      .withColumn("bucket", (1 until DepthBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col("v_u").cast("double") >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .groupBy("bucket")
      .agg(sum(col("cnt")).as("n"), min(col("v_u")).as("lo_u"),
        max(col("v_u")).as("hi_u"), count(lit(1)).as("ndv"))
      .orderBy("bucket")
  }

  private val q180Oracle: String = {
    val fracs = (1 until DepthBuckets).map(_.toDouble / DepthBuckets)
    val cutsList = s"quantile_cont(v_u, [${fracs.mkString(", ")}])"
    val bucketExpr = (1 until DepthBuckets).map(i =>
      s"(CASE WHEN CAST(v_u AS DOUBLE) > cuts[$i] THEN 1 ELSE 0 END)")
      .mkString("1 + ", " + ", "")
    s"""WITH vals AS (SELECT
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v_u
       |  FROM lineitem),
       |c AS (SELECT $cutsList AS cuts FROM vals),
       |b AS (SELECT v_u, $bucketExpr AS bucket FROM vals CROSS JOIN c)
       |SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n,
       |  min(v_u) AS lo_u, max(v_u) AS hi_u,
       |  CAST(count(DISTINCT v_u) AS BIGINT) AS ndv
       |FROM b GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q178_skyline", q178, Some(q178Oracle)),
    QueryDef("q179_twap", q179, Some(q179Oracle)),
    QueryDef("q180_equidepth_stats", q180, Some(q180Oracle)))
}
