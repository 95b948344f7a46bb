package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.MultimodalOps

/** Round-13 ninth wave: ZIP catalog parse (q339 — tenth container;
  * the backwards EOCD scan), one alternating-least-squares step
  * (q340 — rank-1 recommender update on exact fixed-point grids),
  * decision-stump split finding (q341 — best Gini split from ONE
  * cumulative bucket census), and business-day latency (q342 —
  * closed-form weekday counting, no calendar table).
  */
object Round13iQueries {

  // -- q339: ZIP catalog metadata roundtrip -------------------------------------------
  // The tenth container format; what's NEW is the entry-point
  // discipline — the EOCD record sits a variable-length comment
  // before EOF, so the reader scans BACKWARDS and must reject
  // signature look-alikes via the comment-length-reaches-EOF check,
  // then walks the central directory forward validating every entry
  // signature and the entry count. Every 7th payload corrupts the
  // EOCD signature and must come back NULL.
  private def q339(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val payload = MultimodalOps.zipCatalog(
      col("doc_id") % 5 + 1, col("n_chars") % 20, col("doc_id") % 7 =!= 0)
    val meta = MultimodalOps.zipMeta(col("payload"))
    d.select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"), meta.as("__m"))
      .select(col("doc_id"),
        col("__m").getItem(0).as("n_entries"),
        col("__m").getItem(1).as("cd_size"),
        col("__m").getItem(2).as("comment_len"),
        col("__m").getItem(3).as("total_name_len"),
        col("__m").getItem(4).as("total_usize"))
      .orderBy("doc_id")
  }

  private val q339Oracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 <> 0 THEN doc_id % 5 + 1 END AS n_entries,
      |  CASE WHEN doc_id % 7 <> 0 THEN (doc_id % 5 + 1) * 48 END AS cd_size,
      |  CASE WHEN doc_id % 7 <> 0 THEN n_chars % 20 END AS comment_len,
      |  CASE WHEN doc_id % 7 <> 0 THEN (doc_id % 5 + 1) * 2
      |    END AS total_name_len,
      |  CASE WHEN doc_id % 7 <> 0 THEN (doc_id % 5 + 1) * 11
      |    + 5 * ((doc_id % 5 + 1) * (doc_id % 5) // 2) END AS total_usize
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q340: one rank-1 ALS step --------------------------------------------------------
  // The alternating-least-squares recommender update, exactly: rating
  // r(u, item) = the user's mean event value per type (milli-cents),
  // item factors initialize at 1.0 on the 1e3 fixed-point grid, then
  // ONE alternation — closed-form rank-1 least squares both ways:
  // u_i = Σ_j r·v div Σ_j (v·v div G), then v_j = Σ_i r·u div
  // Σ_i (u·u div G) — plus the per-item mean squared residual. All
  // products ride DECIMAL/HUGEINT partials; every divide is a
  // positive trunc-div (ratings are non-negative). Distributed shape:
  // cell census → user-keyed reduce → item-keyed reduce; nothing is
  // ever collected.
  private val AlsG = 1000L

  private def q340(spark: SparkSession, sfDir: String): DataFrame = {
    val cells = Tables.read(spark, sfDir, "events")
      .select(col("user_id").as("u"), col("event_type").as("item"),
        floor(col("value") * lit(100) + lit(0.5)).cast(LongType).as("c"))
      .groupBy("u", "item")
      .agg(expr("sum(c) * 1000 div count(*)").as("r"))
      .localCheckpoint(true) // feeds the user step AND the item step
    val users = cells.groupBy("u").agg(
      expr(s"sum(r * $AlsG) div sum(($AlsG * $AlsG) div $AlsG)").as("uf"))
    val joined = cells.join(users, "u")
      .localCheckpoint(true) // feeds the item step AND the residuals
    val items = joined.groupBy("item").agg(
      count(lit(1)).as("n_users"),
      expr("CAST(sum(CAST(r AS DECIMAL(38,0)) * uf) div" +
        s" sum(CAST(uf AS DECIMAL(38,0)) * uf div $AlsG) AS BIGINT)")
        .as("vf"))
    joined.join(broadcast(items), "item")
      .withColumn("e", col("r") - expr(s"uf * vf div $AlsG"))
      .groupBy("item", "n_users", "vf")
      .agg(expr("CAST(sum(CAST(e AS DECIMAL(38,0)) * e)" +
        " div count(*) AS BIGINT)").as("mse"))
      .select(col("item"), col("n_users"), col("vf"), col("mse"))
      .orderBy("item")
  }

  private val q340Oracle: String =
    s"""WITH cells AS (SELECT user_id AS u, event_type AS item,
       |    CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) * 1000
       |      // count(*) AS BIGINT) AS r
       |  FROM events GROUP BY 1, 2),
       |users AS (SELECT u, CAST(sum(r * $AlsG)
       |    // sum(($AlsG * $AlsG) // $AlsG) AS BIGINT) AS uf
       |  FROM cells GROUP BY 1),
       |joined AS (SELECT item, r, uf FROM cells JOIN users USING (u)),
       |items AS (SELECT item, count(*) AS n_users,
       |    CAST(sum(CAST(r AS HUGEINT) * uf)
       |      // sum(CAST(uf AS HUGEINT) * uf // $AlsG) AS BIGINT) AS vf
       |  FROM joined GROUP BY 1),
       |res AS (SELECT j.item, n_users, vf, r - (uf * vf // $AlsG) AS e
       |  FROM joined j JOIN items USING (item))
       |SELECT item, n_users, vf,
       |  CAST(sum(CAST(e AS HUGEINT) * e) // count(*) AS BIGINT) AS mse
       |FROM res GROUP BY item, n_users, vf ORDER BY item""".stripMargin

  // -- q341: decision-stump split finding -----------------------------------------------
  // Single-feature tree induction, the one-pass way: bucket the
  // feature ($50k order-value bins), take ONE cumulative census, and
  // evaluate the exact Gini gain of every bucket-boundary split
  // against the parent — impurities and the weighted-child average
  // all live on the ppb grid with DECIMAL/HUGEINT squares. Best split
  // = max gain, ties to the smaller threshold.
  private val StumpW = 5000000L

  private def giniPpb(n: String, p: String): String =
    s"1000000000 - (CAST($p AS DECIMAL(38,0)) * $p" +
      s" + CAST($n - $p AS DECIMAL(38,0)) * ($n - $p))" +
      s" * 1000000000 div (CAST($n AS DECIMAL(38,0)) * $n)"

  private def giniPpbSql(n: String, p: String): String =
    s"1000000000 - (CAST($p AS HUGEINT) * $p" +
      s" + CAST($n - $p AS HUGEINT) * ($n - $p))" +
      s" * 1000000000 // (CAST($n AS HUGEINT) * $n)"

  private def q341(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "orders")
      .select(expr(s"CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)" +
        s" div $StumpW").as("b"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("t"))
      .groupBy("b").agg(count(lit(1)).as("nb"), sum(col("t")).as("pb"))
    val tot = census.agg(sum(col("nb")).as("n"), sum(col("pb")).as("p"))
    val w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    census
      .withColumn("nl", sum(col("nb")).over(w))
      .withColumn("pl", sum(col("pb")).over(w))
      .crossJoin(broadcast(tot))
      .where(col("nl") < col("n")) // the full-table "split" is no split
      .withColumn("gp", expr(giniPpb("n", "p")))
      .withColumn("gl", expr(giniPpb("nl", "pl")))
      .withColumn("gr", expr(giniPpb("(n - nl)", "(p - pl)")))
      .withColumn("gain_ppb",
        expr("gp - (nl * gl + (n - nl) * gr) div n"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("gain_ppb").desc, col("b"))))
      .select(((col("b") + 1) * StumpW).as("threshold_cents"),
        col("nl").as("n_left"), col("pl").as("pos_left"),
        col("gain_ppb"), (col("rk") === 1).as("is_best"))
      .orderBy("threshold_cents")
  }

  private val q341Oracle: String =
    s"""WITH census AS (SELECT
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) // $StumpW AS b,
       |    count(*) AS nb,
       |    count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS pb
       |  FROM orders GROUP BY 1),
       |tot AS (SELECT CAST(sum(nb) AS BIGINT) AS n,
       |    CAST(sum(pb) AS BIGINT) AS p FROM census),
       |cum AS (SELECT b,
       |    CAST(sum(nb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS nl,
       |    CAST(sum(pb) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING)
       |      AS BIGINT) AS pl
       |  FROM census),
       |sp AS (SELECT b, nl, pl, n, p,
       |    CAST(${giniPpbSql("n", "p")} AS BIGINT) AS gp,
       |    CAST(${giniPpbSql("nl", "pl")} AS BIGINT) AS gl,
       |    CAST(${giniPpbSql("(n - nl)", "(p - pl)")} AS BIGINT) AS gr
       |  FROM cum CROSS JOIN tot WHERE nl < n),
       |gains AS (SELECT b, nl, pl,
       |    CAST(gp - (nl * gl + (n - nl) * gr) // n AS BIGINT) AS gain_ppb
       |  FROM sp),
       |rk AS (SELECT *, row_number() OVER (ORDER BY gain_ppb DESC, b)
       |    AS rk FROM gains)
       |SELECT (b + 1) * $StumpW AS threshold_cents, nl AS n_left,
       |  pl AS pos_left, gain_ppb, rk = 1 AS is_best
       |FROM rk ORDER BY threshold_cents""".stripMargin

  // -- q342: business-day latency --------------------------------------------------------
  // Order-to-ship latency in BUSINESS days, closed-form (no calendar
  // table): with e = days since 1970-01-01 (a Thursday), day k is a
  // Sunday iff k ≡ 3 (mod 7) and a Saturday iff k ≡ 2, so weekdays in
  // [0, e) = e − (e+3) div 7 − (e+4) div 7, and the latency over
  // (order, ship] is one subtraction of that prefix function. The
  // order→lineitem join is the only shuffle; the rollup is an
  // order-priority census.
  private def bizPrefix(e: String): String =
    s"($e - ($e + 3) div 7 - ($e + 4) div 7)"

  private def bizPrefixSql(e: String): String =
    s"($e - ($e + 3) // 7 - ($e + 4) // 7)"

  private def q342(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"),
        expr("CAST(datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')" +
          " AS BIGINT)").as("e1"))
    val ord = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderkey").as("ok"), col("o_orderpriority").as("pr"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')" +
          " AS BIGINT)").as("e0"))
    li.join(ord, "ok")
      .where(col("e1") >= col("e0"))
      .withColumn("biz", expr(
        s"${bizPrefix("(e1 + 1)")} - ${bizPrefix("(e0 + 1)")}"))
      .groupBy("pr").agg(count(lit(1)).as("n"),
        expr("sum(biz) * 1000 div count(*)").as("avg_biz_milli"),
        max(col("biz")).as("max_biz"),
        expr("count(CASE WHEN biz <= 10 THEN 1 END) * 1000000" +
          " div count(*)").as("within10_ppm"))
      .orderBy("pr")
  }

  private val q342Oracle: String = {
    val p1 = bizPrefixSql("(e1 + 1)")
    val p0 = bizPrefixSql("(e0 + 1)")
    s"""WITH j AS (SELECT o_orderpriority AS pr,
       |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT)
       |      AS e1,
       |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
       |      AS e0
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |b AS (SELECT pr, $p1 - $p0 AS biz FROM j WHERE e1 >= e0)
       |SELECT pr, count(*) AS n,
       |  CAST(sum(biz) * 1000 // count(*) AS BIGINT) AS avg_biz_milli,
       |  CAST(max(biz) AS BIGINT) AS max_biz,
       |  CAST(count(CASE WHEN biz <= 10 THEN 1 END) * 1000000 // count(*)
       |    AS BIGINT) AS within10_ppm
       |FROM b GROUP BY pr ORDER BY pr""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q339_zip_catalog", q339, Some(q339Oracle)),
    QueryDef("q340_als_step", q340, Some(q340Oracle)),
    QueryDef("q341_decision_stump", q341, Some(q341Oracle)),
    QueryDef("q342_business_days", q342, Some(q342Oracle)),
  )
}
