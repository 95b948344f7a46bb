package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.StatsOps

/** Round-11 first wave: the documented 100 TB scale path for the two
  * most expensive steady exact-percentile queries (VERDICT r10 #2) —
  * sketch variants of q180's equi-depth statistics and q103's MAD
  * outlier census, each GATED against the exact statistic inside the
  * same query so the driver hash gate fails if a sketch ever drifts
  * out of its documented tolerance.
  */
object Round11Queries {

  // -- q188: approximate equi-depth column statistics -------------------------
  // q180's 100 TB form: cut points from percentile_approx (the
  // GK-sketch — one pass, bounded memory, mergeable across executors;
  // exact interpolated percentiles need a full sort of the column) and
  // NDV from HLL (approx_count_distinct at 1% rsd) instead of an exact
  // dedup exchange. The gate: per bucket, the realized depth must sit
  // within 5% of the ideal n/16 (the equi-depth property the sketch
  // cuts promise — rank error at accuracy 10⁴ is ≤0.01% of n, so 5%
  // is generous headroom for tie mass), and the HLL estimate within
  // 5% of the exact per-bucket NDV (5 rsd). The oracle recomputes
  // n_total exactly and emits TRUE gates — a drifting sketch fails
  // the driver hash compare at whichever SF it drifts.
  private val DepthBuckets = 16
  private val DepthAccuracy = 10000

  private def q188(spark: SparkSession, sfDir: String): DataFrame = {
    val vals = Tables.read(spark, sfDir, "lineitem")
      .select(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
        .as("v_u"))
      .localCheckpoint(true) // cuts pass AND the census passes
    val fracs = (1 until DepthBuckets).map(_.toDouble / DepthBuckets)
    val cuts = vals.agg(percentile_approx(col("v_u"),
      array(fracs.map(lit): _*), lit(DepthAccuracy)).as("__cuts"))
    val bucketed = vals.crossJoin(broadcast(cuts))
      .withColumn("bucket", (1 until DepthBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col("v_u").cast("double") >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .localCheckpoint(true) // HLL census AND exact-NDV census
    // HLL NDV map-side; the exact NDV (the gate's truth side) is the
    // one dedup exchange — dropped entirely in the production scale
    // mode, where only the sketch columns survive
    val perBucket = bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        approx_count_distinct(col("v_u"), 0.01).as("andv"))
    val exactNdv = bucketed.select("bucket", "v_u").distinct()
      .groupBy("bucket").agg(count(lit(1)).as("endv"))
    val total = vals.agg(count(lit(1)).as("__t"))
    perBucket.join(broadcast(exactNdv), "bucket")
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("__t").as("n_total"),
        (abs(col("n") - col("__t") / DepthBuckets).cast("double") <=
          lit(0.05) * col("__t") / DepthBuckets).as("depth_ok"),
        (abs(col("andv") - col("endv")).cast("double") <=
          lit(0.05) * col("endv")).as("ndv_ok"))
      .orderBy("bucket")
  }

  private val q188Oracle: String =
    s"""WITH t AS (SELECT count(*) AS n_total FROM lineitem)
       |SELECT CAST(b AS INTEGER) AS bucket, n_total,
       |  TRUE AS depth_ok, TRUE AS ndv_ok
       |FROM (SELECT unnest(range(1, ${DepthBuckets + 1})) AS b), t
       |ORDER BY bucket""".stripMargin

  // -- q189: approximate MAD outlier census ------------------------------------
  // q103's 100 TB form — see [[StatsOps.madOutliersApprox]].
  private def q189(spark: SparkSession, sfDir: String): DataFrame =
    StatsOps.madOutliersApprox(
      Tables.read(spark, sfDir, "lineitem"), "l_returnflag", "l_extendedprice")

  private val q189Oracle: String =
    StatsOps.madOutliersApproxSql("lineitem", "l_returnflag", "l_extendedprice")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q188_equidepth_approx", q188, Some(q188Oracle)),
    QueryDef("q189_mad_approx", q189, Some(q189Oracle)))
}
