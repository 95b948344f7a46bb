package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 tenth wave: string dictionary-encoding advisor (q343 —
  * the layout what-if q325 runs for numerics, for strings), Qini
  * uplift deciles (q344 — incremental-impact targeting curve),
  * price/volume revenue bridge (q345 — the FP&A decomposition of a
  * year-over-year revenue delta), and HDR-histogram percentiles
  * (q346 — p50/p95/p99 from a fixed log2 bucket census, the
  * observability pattern whose state never grows with data).
  */
object Round13jQueries {

  // -- q343: string dictionary-encoding advisor ---------------------------------------
  // The string sibling of q325: for each categorical column, compare
  // PLAIN layout (bytes + a 4-byte offset per value) against DICT
  // (distinct bytes + 4-byte offsets once, plus an index per row whose
  // width follows the cardinality ladder). The per-column distinct
  // census is value-grain (tiny for categoricals at any scale); rows
  // never carry string payloads past their own census.
  private def q343(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderpriority").as("pr"), col("o_orderstatus").as("st"))
      .localCheckpoint(true) // two column censuses off one scan
    def advise(c: String, name: String): DataFrame = {
      val census = orders.groupBy(col(c).as("v"))
        .agg(count(lit(1)).as("cnt"),
          octet_length(col(c)).cast("long").as("len"))
      census.agg(
        sum(col("cnt")).as("n"), count(lit(1)).as("d"),
        sum(col("cnt") * col("len")).as("val_bytes"),
        sum(col("len")).as("dict_val_bytes"))
        .select(lit(name).as("col"), col("n"), col("d"),
          (col("val_bytes") + col("n") * 4L).as("plain_bytes"),
          (col("dict_val_bytes") + col("d") * 4L +
            col("n") * when(col("d") <= 256L, 1L)
              .when(col("d") <= 65536L, 2L).otherwise(4L))
            .as("dict_bytes"))
        .withColumn("savings_ppm",
          expr("(plain_bytes - dict_bytes) * 1000000 div plain_bytes"))
    }
    advise("pr", "o_orderpriority").unionAll(advise("st", "o_orderstatus"))
      .orderBy("col")
  }

  private val q343Oracle: String = {
    def branch(c: String, name: String) =
      s"""SELECT '$name' AS col, CAST(sum(cnt) AS BIGINT) AS n,
         |  count(*) AS d,
         |  CAST(sum(cnt * len) + sum(cnt) * 4 AS BIGINT) AS plain_bytes,
         |  CAST(sum(len) + count(*) * 4 + sum(cnt) *
         |    (CASE WHEN count(*) <= 256 THEN 1
         |      WHEN count(*) <= 65536 THEN 2 ELSE 4 END) AS BIGINT)
         |    AS dict_bytes,
         |  CAST((sum(cnt * len) + sum(cnt) * 4
         |      - (sum(len) + count(*) * 4 + sum(cnt) *
         |        (CASE WHEN count(*) <= 256 THEN 1
         |          WHEN count(*) <= 65536 THEN 2 ELSE 4 END)))
         |    * 1000000 // (sum(cnt * len) + sum(cnt) * 4) AS BIGINT)
         |    AS savings_ppm
         |FROM (SELECT $c AS v, count(*) AS cnt, strlen($c) AS len
         |  FROM orders GROUP BY 1)""".stripMargin
    s"""${branch("o_orderpriority", "o_orderpriority")}
       |UNION ALL
       |${branch("o_orderstatus", "o_orderstatus")}
       |ORDER BY col""".stripMargin
  }

  // -- q344: Qini uplift deciles ---------------------------------------------------------
  // The incremental-impact curve behind targeting decisions: units
  // rank by score (account balance) into deciles, treatment is the
  // customer-key parity, outcome is the repeat-'F' conversion; per
  // decile the treated/control conversion rates, and cumulatively the
  // Qini value CT − CC·NT/NC (incremental conversions vs a scaled
  // control). ntile over a TOTAL order (score desc, key) is
  // deterministic; everything after the unit census is decile-grain.
  private def q344(spark: SparkSession, sfDir: String): DataFrame = {
    val fcnt = Tables.read(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F")
      .groupBy(col("o_custkey").as("ck")).agg(count(lit(1)).as("fc"))
    // deciles via the bucketed global-ntile (round 16): the unit
    // census is customer-grain — data-proportional — so the former
    // unpartitioned `ntile OVER (ORDER BY score DESC)` was a
    // single-task sort of the whole population
    val units = graft.ops.LayoutOps.globalNtile(
      Tables.read(spark, sfDir, "customer")
        .select(col("c_custkey").as("ck"), col("c_acctbal").as("score"),
          (col("c_custkey") % 2).as("treat"))
        .join(fcnt, Seq("ck"), "left")
        .withColumn("conv", when(coalesce(col("fc"), lit(0L)) >= 4L, 1L)
          .otherwise(0L)),
      "score", "ck", 10, "decile", desc = true)
    val cells = units.groupBy("decile").agg(
      sum(when(col("treat") === 1, 1L).otherwise(0L)).as("nt"),
      sum(when(col("treat") === 0, 1L).otherwise(0L)).as("nc"),
      sum(when(col("treat") === 1, col("conv")).otherwise(0L)).as("ct"),
      sum(when(col("treat") === 0, col("conv")).otherwise(0L)).as("cc"))
    val w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cells
      .withColumn("cum_nt", sum(col("nt")).over(w))
      .withColumn("cum_nc", sum(col("nc")).over(w))
      .withColumn("cum_ct", sum(col("ct")).over(w))
      .withColumn("cum_cc", sum(col("cc")).over(w))
      .select(col("decile").cast("long").as("decile"),
        col("nt"), col("nc"),
        expr("ct * 1000000 div nullif(nt, 0)").as("conv_t_ppm"),
        expr("cc * 1000000 div nullif(nc, 0)").as("conv_c_ppm"),
        expr("cum_ct - cum_cc * cum_nt div nullif(cum_nc, 0)")
          .as("qini_cum"))
      .orderBy("decile")
  }

  private val q344Oracle: String =
    """WITH fcnt AS (SELECT o_custkey AS ck, count(*) AS fc FROM orders
      |  WHERE o_orderstatus = 'F' GROUP BY 1),
      |units AS (SELECT c_custkey AS ck, c_custkey % 2 AS treat,
      |    CASE WHEN coalesce(fc, 0) >= 4 THEN 1 ELSE 0 END AS conv,
      |    ntile(10) OVER (ORDER BY c_acctbal DESC, c_custkey) AS decile
      |  FROM customer LEFT JOIN fcnt ON c_custkey = ck),
      |cells AS (SELECT decile,
      |    count(CASE WHEN treat = 1 THEN 1 END) AS nt,
      |    count(CASE WHEN treat = 0 THEN 1 END) AS nc,
      |    count(CASE WHEN treat = 1 AND conv = 1 THEN 1 END) AS ct,
      |    count(CASE WHEN treat = 0 AND conv = 1 THEN 1 END) AS cc
      |  FROM units GROUP BY 1),
      |cum AS (SELECT *,
      |    sum(nt) OVER w AS cum_nt, sum(nc) OVER w AS cum_nc,
      |    sum(ct) OVER w AS cum_ct, sum(cc) OVER w AS cum_cc
      |  FROM cells WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING))
      |SELECT CAST(decile AS BIGINT) AS decile, nt, nc,
      |  CAST(ct * 1000000 // nullif(nt, 0) AS BIGINT) AS conv_t_ppm,
      |  CAST(cc * 1000000 // nullif(nc, 0) AS BIGINT) AS conv_c_ppm,
      |  CAST(cum_ct - cum_cc * cum_nt // nullif(cum_nc, 0) AS BIGINT)
      |    AS qini_cum
      |FROM cum ORDER BY decile""".stripMargin

  // -- q345: price/volume revenue bridge -------------------------------------------------
  // The FP&A decomposition of a year-over-year revenue delta per
  // segment: volume effect = ΔQ·p₀, price effect = Q₁·Δp, residual =
  // what truncation and intra-segment mix leave behind (small by
  // construction, reported so the bridge audits itself). Unit prices
  // are exact milli-cent rationals from one conditional-aggregation
  // scan; the only signed divisions ride the sign-safe pattern.
  private val PvmY0 = 1996
  private val PvmY1 = 1997

  private def q345(spark: SparkSession, sfDir: String): DataFrame = {
    def yr(y: Int, e: String) =
      s"sum(CASE WHEN year(l_shipdate) = $y THEN $e ELSE 0 END)"
    val cents = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    val qty = "CAST(l_quantity AS BIGINT)"
    Tables.read(spark, sfDir, "lineitem")
      .where(expr(s"year(l_shipdate) IN ($PvmY0, $PvmY1)"))
      .groupBy(col("l_returnflag").as("flag"))
      .agg(expr(s"${yr(PvmY0, cents)}").as("rev0"),
        expr(s"${yr(PvmY1, cents)}").as("rev1"),
        expr(s"${yr(PvmY0, qty)}").as("q0"),
        expr(s"${yr(PvmY1, qty)}").as("q1"))
      .withColumn("p0_milli", expr("rev0 * 1000 div nullif(q0, 0)"))
      .withColumn("p1_milli", expr("rev1 * 1000 div nullif(q1, 0)"))
      .withColumn("vol_u", expr("CASE WHEN q1 < q0" +
        " THEN -((q0 - q1) * p0_milli div 1000)" +
        " ELSE (q1 - q0) * p0_milli div 1000 END"))
      .withColumn("price_u", expr("CASE WHEN p1_milli < p0_milli" +
        " THEN -(q1 * (p0_milli - p1_milli) div 1000)" +
        " ELSE q1 * (p1_milli - p0_milli) div 1000 END"))
      .select(col("flag"), col("rev0"), col("rev1"),
        (col("rev1") - col("rev0")).as("delta_u"),
        col("vol_u"), col("price_u"),
        (col("rev1") - col("rev0") - col("vol_u") - col("price_u"))
          .as("resid_u"))
      .orderBy("flag")
  }

  private val q345Oracle: String = {
    def yr(y: Int, e: String) =
      s"sum(CASE WHEN year(l_shipdate) = $y THEN $e ELSE 0 END)"
    val cents = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"
    val qty = "CAST(l_quantity AS BIGINT)"
    s"""WITH base AS (SELECT l_returnflag AS flag,
       |    CAST(${yr(PvmY0, cents)} AS BIGINT) AS rev0,
       |    CAST(${yr(PvmY1, cents)} AS BIGINT) AS rev1,
       |    CAST(${yr(PvmY0, qty)} AS BIGINT) AS q0,
       |    CAST(${yr(PvmY1, qty)} AS BIGINT) AS q1
       |  FROM lineitem WHERE year(l_shipdate) IN ($PvmY0, $PvmY1)
       |  GROUP BY 1),
       |p AS (SELECT *,
       |    rev0 * 1000 // nullif(q0, 0) AS p0_milli,
       |    rev1 * 1000 // nullif(q1, 0) AS p1_milli FROM base),
       |eff AS (SELECT *,
       |    CASE WHEN q1 < q0 THEN -((q0 - q1) * p0_milli // 1000)
       |      ELSE (q1 - q0) * p0_milli // 1000 END AS vol_u,
       |    CASE WHEN p1_milli < p0_milli
       |      THEN -(q1 * (p0_milli - p1_milli) // 1000)
       |      ELSE q1 * (p1_milli - p0_milli) // 1000 END AS price_u
       |  FROM p)
       |SELECT flag, rev0, rev1, rev1 - rev0 AS delta_u,
       |  CAST(vol_u AS BIGINT) AS vol_u, CAST(price_u AS BIGINT) AS price_u,
       |  CAST(rev1 - rev0 - vol_u - price_u AS BIGINT) AS resid_u
       |FROM eff ORDER BY flag""".stripMargin
  }

  // -- q346: HDR-histogram percentiles ----------------------------------------------------
  // The observability percentile pattern: a fixed log2 bucket census
  // (bucket = floor(log2 v) via binary-string length — exact, no
  // float log) whose state never grows with data and merges by
  // addition; p50/p95/p99 read off the cumulative census as the first
  // bucket covering the ceil(p·n) rank, reported as the bucket's
  // inclusive upper bound 2^(b+1)−1.
  private def q346(spark: SparkSession, sfDir: String): DataFrame = {
    val census = Tables.read(spark, sfDir, "events")
      .select(col("event_type").as("ty"),
        expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").as("v"))
      .where(col("v") >= 1L)
      .groupBy(col("ty"), expr("length(bin(v)) - 1").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("ty").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = census.withColumn("cum", sum(col("cnt")).over(w))
    def pick(p: Long, name: String) =
      min(when(col("cum") * 1000000L >= col("n") * p,
        expr("shiftleft(CAST(1 AS BIGINT), CAST(b + 1 AS INT)) - 1")))
        .as(name)
    cum.join(broadcast(census.groupBy("ty").agg(sum(col("cnt")).as("n"))),
      "ty")
      .groupBy("ty", "n")
      .agg(pick(500000L, "p50_hi"), pick(950000L, "p95_hi"),
        pick(990000L, "p99_hi"), max(col("b")).cast("long").as("max_bucket"))
      .select(col("ty"), col("n"), col("p50_hi"), col("p95_hi"),
        col("p99_hi"), col("max_bucket"))
      .orderBy("ty")
  }

  private val q346Oracle: String =
    """WITH census AS (SELECT event_type AS ty,
      |    length(bin(v)) - 1 AS b, count(*) AS cnt
      |  FROM (SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT)
      |      AS v FROM events) WHERE v >= 1 GROUP BY 1, 2),
      |cum AS (SELECT ty, b, cnt, sum(cnt) OVER (PARTITION BY ty ORDER BY b
      |    ROWS UNBOUNDED PRECEDING) AS cum FROM census),
      |tot AS (SELECT ty, CAST(sum(cnt) AS BIGINT) AS n FROM census
      |  GROUP BY 1)
      |SELECT ty, n,
      |  min(CASE WHEN cum * 1000000 >= n * 500000
      |    THEN (CAST(1 AS BIGINT) << CAST(b + 1 AS INTEGER)) - 1 END)
      |    AS p50_hi,
      |  min(CASE WHEN cum * 1000000 >= n * 950000
      |    THEN (CAST(1 AS BIGINT) << CAST(b + 1 AS INTEGER)) - 1 END)
      |    AS p95_hi,
      |  min(CASE WHEN cum * 1000000 >= n * 990000
      |    THEN (CAST(1 AS BIGINT) << CAST(b + 1 AS INTEGER)) - 1 END)
      |    AS p99_hi,
      |  CAST(max(b) AS BIGINT) AS max_bucket
      |FROM cum JOIN tot USING (ty) GROUP BY ty, n ORDER BY ty""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q343_dict_advisor", q343, Some(q343Oracle)),
    QueryDef("q344_qini_uplift", q344, Some(q344Oracle)),
    QueryDef("q345_price_volume_mix", q345, Some(q345Oracle)),
    QueryDef("q346_hdr_percentiles", q346, Some(q346Oracle)),
  )
}
