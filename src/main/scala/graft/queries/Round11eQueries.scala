package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, MixOps}

/** Round-11 fifth wave: weighted shortest paths (the min-plus sibling
  * of q150's BFS), lakehouse compaction planning, and the
  * watermark-sizing lateness census.
  */
object Round11eQueries {

  // -- q203: weighted SSSP distance census -----------------------------------
  // Blast-radius with COSTS: q150 asked "how many hops away", this
  // asks "how cheap is the cheapest route" over the same undirected
  // customer↔supplier trade graph, edge weight = 1 + min lineitem
  // quantity ever traded on the pair (BIGINT, so min-plus sums are
  // exact). Frontier-restricted Bellman-Ford — see
  // [[GraphOps.ssspDistances]] for the exactness argument and the
  // per-round one-edge-shuffle scale shape. Node ids are namespaced
  // like q108/q150 (customer 2k, supplier 2k+1); seeds are the
  // custkey % 100 == 1 cohort.
  private val SsspRounds = 4

  private def q203(spark: SparkSession, sfDir: String): DataFrame = {
    val trade = Tables.read(spark, sfDir, "orders")
      .join(Tables.read(spark, sfDir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .agg((min(floor(col("l_quantity"))) + 1).as("w"))
    val edges = trade.select(col("c").as("src"), col("s").as("dst"), col("w"))
      .unionAll(trade.select(col("s").as("src"), col("c").as("dst"), col("w")))
    val seeds = trade.where(col("c") % 200 === 2)
      .select(col("c").as("node")).distinct()
    GraphOps.ssspDistances(edges, seeds, SsspRounds)
  }

  private val q203Oracle: String = {
    val trade =
      """SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
        |  CAST(min(floor(l_quantity)) AS BIGINT) + 1 AS w
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY 1, 2""".stripMargin
    GraphOps.ssspDistancesSql(
      s"""SELECT c AS src, s AS dst, w FROM ($trade)
         |UNION ALL SELECT s AS src, c AS dst, w FROM ($trade)""".stripMargin,
      s"SELECT DISTINCT c AS node FROM ($trade) WHERE c % 200 = 2",
      SsspRounds)
  }

  // -- q204: small-file compaction planner -----------------------------------
  // The lakehouse OPTIMIZE planning pass: given a file inventory
  // (here derived deterministically from orders — one "file" per
  // (order-month, o_orderkey % 97) with size = Σ floor(o_totalprice)),
  // pack each partition's files into target-sized compaction bins by
  // size-descending next-fit: order files (size desc, id asc), prefix-
  // sum, bin = (cumsum − 1) div target. Every window is PARTITION-
  // keyed (the month), so the plan scales as one hash shuffle + a
  // per-partition sort no matter how many partitions the 100 TB table
  // has; a file larger than the target gets a bin of its own by the
  // prefix-sum fold. Output: per-partition plan summary — the
  // before/after file counts and bin balance the compactor's cost
  // model needs.
  private val CompactTarget = 50000000L

  private def q204(spark: SparkSession, sfDir: String): DataFrame = {
    val files = Tables.read(spark, sfDir, "orders")
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("part"),
        (col("o_orderkey") % 97).as("file_id"))
      .agg(sum(floor(col("o_totalprice"))).as("bytes"))
    val w = Window.partitionBy("part")
      .orderBy(col("bytes").desc, col("file_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = files
      .withColumn("cum", sum(col("bytes")).over(w))
      .withColumn("bin", expr(s"(cum - 1) div $CompactTarget"))
    val bins = binned.groupBy("part", "bin")
      .agg(count(lit(1)).as("nf"), sum(col("bytes")).as("bb"))
    bins.groupBy("part")
      .agg(sum(col("nf")).as("n_files"), count(lit(1)).as("n_bins"),
        sum(col("bb")).as("bytes_total"),
        max(col("bb")).as("max_bin_bytes"), min(col("bb")).as("min_bin_bytes"))
      .orderBy("part")
  }

  private val q204Oracle: String =
    s"""WITH files AS (
       |  SELECT strftime(o_orderdate, '%Y-%m') AS part,
       |    o_orderkey % 97 AS file_id,
       |    CAST(sum(floor(o_totalprice)) AS BIGINT) AS bytes
       |  FROM orders GROUP BY 1, 2),
       |binned AS (
       |  SELECT part, bytes,
       |    (sum(bytes) OVER (PARTITION BY part ORDER BY bytes DESC, file_id
       |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1)
       |      // $CompactTarget AS bin
       |  FROM files),
       |bins AS (
       |  SELECT part, bin, count(*) AS nf, CAST(sum(bytes) AS BIGINT) AS bb
       |  FROM binned GROUP BY 1, 2)
       |SELECT part, CAST(sum(nf) AS BIGINT) AS n_files, count(*) AS n_bins,
       |  CAST(sum(bb) AS BIGINT) AS bytes_total,
       |  max(bb) AS max_bin_bytes, min(bb) AS min_bin_bytes
       |FROM bins GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q205: arrival-lateness census (watermark sizing) ----------------------
  // The question every Structured Streaming deployment must answer
  // BEFORE picking `withWatermark`: how out-of-order does this feed
  // actually arrive? The fixture's events are perfectly time-ordered
  // (event_id order == ts order; verified), so the feed's arrival
  // process is derived deterministically: each event arrives at
  // ts + delay, delay = portableHash(event_id) % 120 s — a bounded
  // random network delay both engines replay exactly. Lateness of an
  // event = (max event-time seen at its arrival) − (its event-time);
  // the p99/max of that distribution IS the watermark bound (and must
  // come out ≤ 120 s, the generative bound — the census proves it).
  //
  // Scale shape: the running max over arrival order is a GLOBAL
  // prefix — computed without a single-partition window via the
  // q166/globalRank two-level decomposition: rows bucket by exact
  // percentile cuts on the arrival key (one-row broadcast literal),
  // the per-bucket maxima (a 32-row frame, bounded by the CONFIG
  // constant) prefix-max into carry-in values, and each row's
  // watermark = greatest(carry, within-bucket running max) with every
  // data-scale window PARTITIONED by bucket. Exact for ANY cut
  // placement (max is associative; buckets are contiguous in arrival
  // order), so the cuts need no cross-engine parity at all.
  private val LateBuckets = 32
  private val DelayModUs = 120000000L // 120 s of micros
  private val LateSeed = 31L

  private def q205(spark: SparkSession, sfDir: String): DataFrame = {
    val e = Tables.read(spark, sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("aus",
        col("tus") + MixOps.portableHash(col("event_id"), LateSeed) % DelayModUs)
    val fracs = (1 until LateBuckets).map(_.toDouble / LateBuckets)
    val cuts = e.agg(percentile(col("aus"),
      array(fracs.map(lit): _*)).as("__cuts"))
    val bucketed = e.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until LateBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col("aus").cast("double") >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true) // feeds the carry census AND the scan pass
    // carry-in: per-bucket max event-time, prefix-maxed over LOWER
    // buckets — a LateBuckets-row frame (config-bounded, the
    // globalRank offsets argument); 0 is the identity (tus > 0).
    val carries = bucketed.groupBy("__bkt").agg(max(col("tus")).as("__bmax"))
      .withColumn("__carry",
        coalesce(max(col("__bmax")).over(Window.orderBy("__bkt")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__carry"))
    val w = Window.partitionBy("__bkt")
      .orderBy(col("aus").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = bucketed.join(broadcast(carries), "__bkt")
      .withColumn("late_us",
        greatest(col("__carry"), max(col("tus")).over(w)) - col("tus"))
    late.agg(
        count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        element_at(percentile(col("late_us"),
          array(lit(0.5), lit(0.95), lit(0.99))), 1).as("__p50"),
        element_at(percentile(col("late_us"),
          array(lit(0.5), lit(0.95), lit(0.99))), 2).as("__p95"),
        element_at(percentile(col("late_us"),
          array(lit(0.5), lit(0.95), lit(0.99))), 3).as("__p99"),
        max(col("late_us")).as("max_late_us"))
      .select(col("n_events"), col("n_late"),
        expr("n_late * 1000000 div n_events").as("late_ppm"),
        Norm.n4(col("__p50")).as("p50_late_us"),
        Norm.n4(col("__p95")).as("p95_late_us"),
        Norm.n4(col("__p99")).as("p99_late_us"),
        col("max_late_us"))
  }

  private val q205Oracle: String = {
    val h = s"((event_id % ${MixOps.P} + $LateSeed) * 48271) % ${MixOps.P}"
    s"""WITH e AS (SELECT event_id, epoch_us(ts) AS tus,
       |    epoch_us(ts) + ($h) % $DelayModUs AS aus
       |  FROM events),
       |m AS (SELECT tus,
       |    max(tus) OVER (ORDER BY aus, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus AS late_us
       |  FROM e)
       |SELECT count(*) AS n_events,
       |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS late_ppm,
       |  ${graft.etl.OracleSql.n4("quantile_cont(late_us, 0.50)")} AS p50_late_us,
       |  ${graft.etl.OracleSql.n4("quantile_cont(late_us, 0.95)")} AS p95_late_us,
       |  ${graft.etl.OracleSql.n4("quantile_cont(late_us, 0.99)")} AS p99_late_us,
       |  max(late_us) AS max_late_us
       |FROM m""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q203_sssp_census", q203, Some(q203Oracle)),
    QueryDef("q204_compaction_plan", q204, Some(q204Oracle)),
    QueryDef("q205_lateness_census", q205, Some(q205Oracle)))
}
