package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Round-13 fourth wave: leave-one-out target encoding (q320 — the
  * leakage-free variant of q182), deletion-propagation audit (q321 —
  * the GDPR erasure blast-radius report, with 2-hop key propagation),
  * and the DAU/WAU/MAU engagement rollup (q322 — exact rolling
  * DISTINCT via map-side window expansion of the day-user census).
  */
object Round13dQueries {

  // -- q320: leave-one-out target encoding ---------------------------------------
  // q182's target encoding leaks: a row's own label sits inside its
  // category mean. The standard fix encodes each row against the
  // category WITHOUT itself, plus m-estimate smoothing toward the
  // global rate:  enc = (sum_cat − t_row + m·p_global) / (n_cat − 1 + m).
  // Everything is a count, so with p_global = G1/GN the encoding is
  // ONE exact rational per (category, label) cell:
  //   enc_ppm = ((sum−t)·GN + m·G1)·1e6 div ((n−1+m)·GN)
  // (DECIMAL/HUGEINT products). A row's encoding depends only on its
  // (category, own-label) cell, so the output is the cell table — the
  // artifact a feature store persists. Target: order status = 'F'.
  private val LooM = 10L

  private def q320(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("cat"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("t"))
    val cells = orders.groupBy("cat", "t")
      .agg(count(lit(1)).as("n_rows"))
    val cats = cells.groupBy("cat")
      .agg(sum(col("n_rows")).as("n"),
        sum(col("t") * col("n_rows")).as("s"))
    val glob = cells.agg(sum(col("n_rows")).as("gn"),
      sum(col("t") * col("n_rows")).as("g1"))
    cells.join(cats, "cat").crossJoin(broadcast(glob))
      .select(col("cat"), col("t"), col("n_rows"),
        expr(s"CAST(((CAST(s - t AS DECIMAL(38,0)) * gn + $LooM * g1)" +
          s" * 1000000) div (CAST(n - 1 + $LooM AS DECIMAL(38,0)) * gn)" +
          " AS BIGINT)").as("enc_ppm"))
      .orderBy("cat", "t")
  }

  private val q320Oracle: String =
    s"""WITH o AS (SELECT o_orderpriority AS cat,
       |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS t
       |  FROM orders),
       |cells AS (SELECT cat, CAST(t AS BIGINT) AS t, count(*) AS n_rows
       |  FROM o GROUP BY 1, 2),
       |cats AS (SELECT cat, CAST(sum(n_rows) AS BIGINT) AS n,
       |    CAST(sum(t * n_rows) AS BIGINT) AS s FROM cells GROUP BY 1),
       |g AS (SELECT CAST(sum(n_rows) AS BIGINT) AS gn,
       |    CAST(sum(t * n_rows) AS BIGINT) AS g1 FROM cells)
       |SELECT cat, t, n_rows,
       |  CAST((CAST(s - t AS HUGEINT) * gn + $LooM * g1) * 1000000
       |    // (CAST(n - 1 + $LooM AS HUGEINT) * gn) AS BIGINT) AS enc_ppm
       |FROM cells JOIN cats USING (cat) CROSS JOIN g
       |ORDER BY cat, t""".stripMargin

  // -- q321: deletion-propagation audit -------------------------------------------
  // The GDPR/right-to-erasure blast radius: BEFORE running a delete,
  // report how many rows it touches in every downstream table. The
  // delete set (users with user_id ≡ 0 mod 97) propagates one hop to
  // orders (custkey ∈ set, broadcast semi join) and TWO hops to
  // lineitem (orderkey of an affected order) — the affected-order key
  // set rides a second semi join, never a row-payload join. Totals
  // and affected counts come from count/semi-count pairs per table.
  private def q321(spark: SparkSession, sfDir: String): DataFrame = {
    val events = Tables.read(spark, sfDir, "events")
    val orders = Tables.read(spark, sfDir, "orders")
    val li = Tables.read(spark, sfDir, "lineitem")
    val del = events.where(col("user_id") % 97 === 0)
      .select(col("user_id").as("k")).distinct()
    val evAff = events.join(broadcast(del),
      col("user_id") === col("k"), "left_semi")
    val ordAff = orders.join(broadcast(del),
      col("o_custkey") === col("k"), "left_semi")
      .localCheckpoint(true) // counted AND feeds the 2nd-hop key set
    val liAff = li.join(broadcast(ordAff.select(col("o_orderkey").as("ok"))
        .distinct()),
      col("l_orderkey") === col("ok"), "left_semi")
    def row(name: String, total: DataFrame, affected: DataFrame) =
      total.agg(count(lit(1)).as("rows_total"))
        .crossJoin(affected.agg(count(lit(1)).as("rows_affected")))
        .select(lit(name).as("tbl"), col("rows_total"),
          col("rows_affected"),
          expr("rows_affected * 1000000 div rows_total")
            .as("affected_ppm"))
    Seq(row("events", events, evAff), row("orders", orders, ordAff),
      row("lineitem", li, liAff)).reduce(_ unionAll _).orderBy("tbl")
  }

  private val q321Oracle: String =
    """WITH del AS (SELECT DISTINCT user_id AS k FROM events
      |  WHERE user_id % 97 = 0),
      |oa AS (SELECT * FROM orders WHERE o_custkey IN (SELECT k FROM del))
      |SELECT 'events' AS tbl,
      |  (SELECT count(*) FROM events) AS rows_total,
      |  (SELECT count(*) FROM events
      |     WHERE user_id IN (SELECT k FROM del)) AS rows_affected,
      |  CAST((SELECT count(*) FROM events
      |      WHERE user_id IN (SELECT k FROM del)) * 1000000
      |    // (SELECT count(*) FROM events) AS BIGINT) AS affected_ppm
      |UNION ALL
      |SELECT 'lineitem',
      |  (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem
      |     WHERE l_orderkey IN (SELECT o_orderkey FROM oa)),
      |  CAST((SELECT count(*) FROM lineitem
      |      WHERE l_orderkey IN (SELECT o_orderkey FROM oa)) * 1000000
      |    // (SELECT count(*) FROM lineitem) AS BIGINT)
      |UNION ALL
      |SELECT 'orders',
      |  (SELECT count(*) FROM orders),
      |  (SELECT count(*) FROM oa),
      |  CAST((SELECT count(*) FROM oa) * 1000000
      |    // (SELECT count(*) FROM orders) AS BIGINT)
      |ORDER BY tbl""".stripMargin

  // -- q322: DAU / WAU / MAU engagement rollup -------------------------------------
  // The engagement headline: per day, distinct active users that day
  // (DAU), over the trailing 7 days (WAU) and 30 days (MAU), plus
  // DAU/MAU stickiness. Rolling DISTINCT cannot ride a running sum —
  // users repeat across days — so each (day, user) census row is
  // EXPANDED map-side to the windows it serves (day+0..6, day+0..29)
  // and re-distinct-ed per target day: shuffle bytes = 7×/30× the
  // census (the exact-answer price; a 100 TB deployment that accepts
  // ±2% swaps in the HLL sketch census, q62's documented switch).
  // Left-edge windows are PARTIAL by definition (trailing semantics);
  // days past the corpus max are dropped against the broadcast bound.
  private def q322(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = Tables.read(spark, sfDir, "events")
      .select(datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast(LongType).as("day"), col("user_id"))
      .distinct()
      .localCheckpoint(true) // the census feeds dau + both expansions
    val bound = pairs.agg(max(col("day")).as("dmax"))
    // count(DISTINCT) = map-side (day, user) pre-distinct + ONE
    // day-keyed exchange (vs a separate distinct shuffle + regroup)
    def rolling(win: Int, name: String): DataFrame = pairs
      .select(explode(sequence(col("day"), col("day") + (win - 1)))
        .as("day"), col("user_id"))
      .crossJoin(broadcast(bound))
      .where(col("day") <= col("dmax"))
      .groupBy("day").agg(countDistinct(col("user_id")).as(name))
    val dau = pairs.groupBy("day").agg(count(lit(1)).as("dau"))
    dau.join(rolling(7, "wau"), "day").join(rolling(30, "mau"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        expr("dau * 1000000 div mau").as("stickiness_ppm"))
      .orderBy("day")
  }

  private val q322Oracle: String =
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
      |SELECT day, dau, wau, mau,
      |  CAST(dau * 1000000 // mau AS BIGINT) AS stickiness_ppm
      |FROM dau JOIN wau USING (day) JOIN mau USING (day)
      |ORDER BY day""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q320_loo_target_encoding", q320, Some(q320Oracle)),
    QueryDef("q321_deletion_audit", q321, Some(q321Oracle)),
    QueryDef("q322_dau_mau", q322, Some(q322Oracle)),
  )
}
