package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Round-12 seventh wave: TPC-H completeness. The fixture carries the
  * TPC-H tables minus partsupp and minus a few columns (no
  * l_shipmode/l_commitdate/l_receiptdate, no c_phone), which leaves
  * Q1, Q6, Q7, Q8, Q13, Q14, Q15 and Q17 fully expressible — added
  * here so the registry carries every classic TPC-H plan shape the
  * fixture can host (Q3/Q5/Q10/Q18 landed in earlier rounds). All
  * money math rides the repo's exact integer grids (cents ×
  * (100 − discount-cents) [× (100 + tax-cents)]) so every sum is
  * reduce-order-free, and ratios are integer `div` picks — no
  * runtime floating point anywhere.
  */
object Round12gQueries {

  private val dec = DecimalType(38, 0)

  /** Per-row integer money grid shared by this wave: extended price in
    * cents, discount/tax in integer cents. The fixture's discounts and
    * taxes are exact multiples of 0.01 stored as doubles, so
    * floor(x*100+0.5) is exact on both engines.
    */
  private def moneyGrid(li: DataFrame): DataFrame =
    li.withColumn("ep_c",
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType))
      .withColumn("d_c",
        floor(col("l_discount") * 100 + lit(0.5)).cast(LongType))
      .withColumn("t_c",
        floor(col("l_tax") * 100 + lit(0.5)).cast(LongType))

  private val gridSql =
    """CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ep_c,
      |  CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS d_c,
      |  CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS t_c""".stripMargin

  // -- q255: TPC-H Q1 (pricing summary report) ---------------------------------
  // The FULL 8-aggregate Q1 (q29 carries a simplified 4-aggregate cut
  // from round 1 — no date filter, no disc/charge terms; this is the
  // spec shape). The canonical full-scan aggregate: one pass over lineitem, 4
  // groups, 8 aggregates. Everything is a map-side partial — the
  // shuffle moves 4 rows × 8 longs no matter the scale factor, which
  // is why Q1 is THE bandwidth benchmark: cost = bytes scanned.
  // sum_disc_u is in 1e-4 dollars, sum_charge_u in 1e-6 dollars
  // (two/three factor-100 grids); the charge partials accumulate in
  // DECIMAL(38,0) from the first merge (a Long sum of ~1e11-per-row
  // terms wraps at ~9e7 rows per group — the q233/q151 overflow
  // class), then land as BIGINT. Averages are integer-div picks in
  // 1e-4 units riding the same aggregate.
  private val Q1Cut = "2000-12-31"

  private def q255(spark: SparkSession, sfDir: String): DataFrame = {
    val li = moneyGrid(Tables.read(spark, sfDir, "lineitem")
        .where(to_date(col("l_shipdate")) <= lit(Q1Cut).cast("date")))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity").cast(LongType).as("qty"),
        col("ep_c"), col("d_c"), col("t_c"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("qty")).as("sum_qty"),
        sum(col("ep_c").cast(dec)).cast(LongType).as("sum_base_u"),
        sum((col("ep_c") * (lit(100L) - col("d_c"))).cast(dec))
          .cast(LongType).as("sum_disc_u"),
        sum((col("ep_c") * (lit(100L) - col("d_c")) *
            (lit(100L) + col("t_c"))).cast(dec))
          .cast(LongType).as("sum_charge_u"),
        expr("sum(qty) * 10000 div count(1)").as("avg_qty_u"),
        expr("sum(ep_c) * 100 div count(1)").as("avg_price_u"),
        expr("sum(d_c) * 100 div count(1)").as("avg_disc_u"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val q255Oracle: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(sum(qty) AS BIGINT) AS sum_qty,
       |  CAST(sum(ep_c) AS BIGINT) AS sum_base_u,
       |  CAST(sum(ep_c * (100 - d_c)) AS BIGINT) AS sum_disc_u,
       |  CAST(sum(ep_c * (100 - d_c) * (100 + t_c)) AS BIGINT)
       |    AS sum_charge_u,
       |  CAST(sum(qty) * 10000 // count(*) AS BIGINT) AS avg_qty_u,
       |  CAST(sum(ep_c) * 100 // count(*) AS BIGINT) AS avg_price_u,
       |  CAST(sum(d_c) * 100 // count(*) AS BIGINT) AS avg_disc_u,
       |  count(*) AS count_order
       |FROM (SELECT l_returnflag, l_linestatus,
       |    CAST(l_quantity AS BIGINT) AS qty, $gridSql
       |  FROM lineitem
       |  WHERE CAST(l_shipdate AS DATE) <= DATE '$Q1Cut')
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  // -- q256: TPC-H Q6 (forecasting revenue change) -----------------------------
  // The pushdown showcase: at 100 TB this query IS its scan, so the
  // date range compares the RAW ISO-8601 string (lexicographic ==
  // chronological, and unlike a to_date() wrap it reaches the parquet
  // scan as PushedFilters alongside l_quantity — plan-asserted in
  // PlanSpec), the projection prunes to 4 columns, and everything
  // above the scan is one map-side one-row partial.
  // revenue_u = Σ ep_c · d_c in 1e-4 dollars.
  private val Q6Start = "1996-01-01"
  private val Q6End = "1997-01-01"

  private def q256(spark: SparkSession, sfDir: String): DataFrame = {
    val li = moneyGrid(Tables.read(spark, sfDir, "lineitem"))
      .where(col("l_shipdate") >= Q6Start && col("l_shipdate") < Q6End &&
        col("d_c").between(5L, 7L) &&
        col("l_quantity") < 24)
    li.agg(
      sum((col("ep_c") * col("d_c")).cast(dec)).cast(LongType)
        .as("revenue_u"),
      count(lit(1)).as("n_rows"))
  }

  private val q256Oracle: String =
    s"""SELECT CAST(sum(ep_c * d_c) AS BIGINT) AS revenue_u,
       |  count(*) AS n_rows
       |FROM (SELECT l_quantity, $gridSql FROM lineitem
       |  WHERE l_shipdate >= '$Q6Start' AND l_shipdate < '$Q6End')
       |WHERE d_c BETWEEN 5 AND 7 AND l_quantity < 24""".stripMargin

  // -- q257: TPC-H Q7 (volume shipping between two nations) --------------------
  // The bidirectional nation-pair join: supplier-side and customer-
  // side dimension chains each broadcast (2 nations cut supplier and
  // customer ~12× before any fact touches them), the single
  // data-sized shuffle is lineitem ⋈ orders on the order key, and the
  // (N1→N2 | N2→N1) disjunction is a residual join filter on two
  // broadcast-attached columns. Year comes off l_shipdate (the
  // shipping year, per spec).
  // pair chosen to be populated in BOTH directions at every SF
  // (sf0.001 carries 14/13 rows for 13→19/19→13)
  private val Q7NationA = "NATION_13"
  private val Q7NationB = "NATION_19"
  private val Q7Start = "1996-01-01"
  private val Q7End = "1998-01-01"

  private def q257(spark: SparkSession, sfDir: String): DataFrame = {
    val nat = Tables.read(spark, sfDir, "nation")
      .where(col("n_name").isin(Q7NationA, Q7NationB))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.read(spark, sfDir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables.read(spark, sfDir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = moneyGrid(Tables.read(spark, sfDir, "lineitem")
        .where(to_date(col("l_shipdate")) >= lit(Q7Start).cast("date") &&
          to_date(col("l_shipdate")) < lit(Q7End).cast("date")))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(to_date(col("l_shipdate"))).cast("long").as("l_year"),
        (col("ep_c") * (lit(100L) - col("d_c"))).as("vol_u"))
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .where((col("supp_nation") === Q7NationA &&
          col("cust_nation") === Q7NationB) ||
        (col("supp_nation") === Q7NationB &&
          col("cust_nation") === Q7NationA))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(col("vol_u").cast(dec)).cast(LongType).as("revenue_u"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val q257Oracle: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  year(CAST(l_shipdate AS DATE)) AS l_year,
       |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
       |    AS BIGINT) AS revenue_u
       |FROM lineitem
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation sn ON sn.n_nationkey = s_nationkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation cn ON cn.n_nationkey = c_nationkey
       |WHERE CAST(l_shipdate AS DATE) >= DATE '$Q7Start'
       |  AND CAST(l_shipdate AS DATE) < DATE '$Q7End'
       |  AND ((sn.n_name = '$Q7NationA' AND cn.n_name = '$Q7NationB')
       |    OR (sn.n_name = '$Q7NationB' AND cn.n_name = '$Q7NationA'))
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  // -- q258: TPC-H Q8 (national market share) ----------------------------------
  // Share of a region's type-filtered order volume supplied by one
  // nation, per order year. The part filter (exact p_type equality on
  // the fixture's single-word types) broadcasts and cuts lineitem
  // ~6× map-side BEFORE the order-key shuffle; customer region and
  // supplier nation both attach by broadcast. The share is the exact
  // integer ppm pick num·1e6 div den riding num/den columns — no
  // float division in either engine.
  private val Q8Region = "ASIA"
  private val Q8Nation = "NATION_2"
  private val Q8Type = "ECONOMY"
  private val Q8Start = "1996-01-01"
  private val Q8End = "1998-01-01"

  private def q258(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = Tables.read(spark, sfDir, "part")
      .where(col("p_type") === Q8Type).select(col("p_partkey"))
    val rnat = Tables.read(spark, sfDir, "nation")
      .join(broadcast(Tables.read(spark, sfDir, "region")
          .where(col("r_name") === Q8Region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = Tables.read(spark, sfDir, "customer")
      .join(broadcast(rnat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supp = Tables.read(spark, sfDir, "supplier")
      .join(broadcast(Tables.read(spark, sfDir, "nation")
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.read(spark, sfDir, "orders")
      .where(to_date(col("o_orderdate")) >= lit(Q8Start).cast("date") &&
        to_date(col("o_orderdate")) < lit(Q8End).cast("date"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(to_date(col("o_orderdate"))).cast("long").as("o_year"))
    val li = moneyGrid(Tables.read(spark, sfDir, "lineitem"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("ep_c") * (lit(100L) - col("d_c"))).as("vol_u"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === Q8Nation, col("vol_u"))
          .otherwise(0L).cast(dec)).cast(LongType).as("nation_u"),
        sum(col("vol_u").cast(dec)).cast(LongType).as("total_u"))
      .select(col("o_year"), col("nation_u"), col("total_u"),
        expr("nation_u * 1000000 div total_u").as("share_ppm"))
      .orderBy(col("o_year"))
  }

  private val q258Oracle: String =
    s"""WITH vol AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) AS o_year,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
       |      AS vol_u,
       |    sn.n_name AS supp_nation
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation cn ON cn.n_nationkey = c_nationkey
       |  JOIN region ON r_regionkey = cn.n_regionkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN nation sn ON sn.n_nationkey = s_nationkey
       |  WHERE p_type = '$Q8Type' AND r_name = '$Q8Region'
       |    AND CAST(o_orderdate AS DATE) >= DATE '$Q8Start'
       |    AND CAST(o_orderdate AS DATE) < DATE '$Q8End'),
       |agg AS (SELECT o_year,
       |    CAST(sum(CASE WHEN supp_nation = '$Q8Nation' THEN vol_u
       |             ELSE 0 END) AS BIGINT) AS nation_u,
       |    CAST(sum(vol_u) AS BIGINT) AS total_u
       |  FROM vol GROUP BY 1)
       |SELECT o_year, nation_u, total_u,
       |  CAST(nation_u * 1000000 // total_u AS BIGINT) AS share_ppm
       |FROM agg ORDER BY o_year""".stripMargin

  // -- q259: TPC-H Q13 (customer order-count distribution) ---------------------
  // The left-join histogram: every customer (including the order-less)
  // → order count → distribution of counts. Two aggregations, the
  // first on the customer key (count rides the join), the second on
  // the tiny count domain. At 100 TB the orders-side pre-aggregate
  // (count per custkey BEFORE the join) keeps the join input
  // aggregate-sized — exactly what this plan does.
  private def q259(spark: SparkSession, sfDir: String): DataFrame = {
    val perCust = Tables.read(spark, sfDir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("__n"))
    Tables.read(spark, sfDir, "customer").select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("__n"), lit(0L)).as("c_count"))
      .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  private val q259Oracle: String =
    """WITH per AS (SELECT c_custkey,
      |    CAST(coalesce(n, 0) AS BIGINT) AS c_count
      |  FROM customer
      |  LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders
      |             GROUP BY 1) o ON o_custkey = c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM per GROUP BY 1
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // -- q260: TPC-H Q14 (promotion effect) --------------------------------------
  // Month-windowed promo-revenue share: the part attach broadcasts,
  // the shipdate month filter prunes the fact, and the CASE-gated
  // numerator and the denominator ride ONE aggregate — the ratio is
  // an integer ppm pick, not a float division.
  private val Q14Start = "1996-03-01"
  private val Q14End = "1996-04-01"

  private def q260(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = Tables.read(spark, sfDir, "part")
      .select(col("p_partkey"), col("p_type"))
    val li = moneyGrid(Tables.read(spark, sfDir, "lineitem")
        .where(to_date(col("l_shipdate")) >= lit(Q14Start).cast("date") &&
          to_date(col("l_shipdate")) < lit(Q14End).cast("date")))
      .select(col("l_partkey"),
        (col("ep_c") * (lit(100L) - col("d_c"))).as("vol_u"))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", col("vol_u")).otherwise(0L)
          .cast(dec)).cast(LongType).as("promo_u"),
        sum(col("vol_u").cast(dec)).cast(LongType).as("total_u"))
      .select(col("promo_u"), col("total_u"),
        expr("promo_u * 1000000 div total_u").as("promo_ppm"))
  }

  private val q260Oracle: String =
    s"""WITH vol AS (
       |  SELECT p_type,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
       |      AS vol_u
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE CAST(l_shipdate AS DATE) >= DATE '$Q14Start'
       |    AND CAST(l_shipdate AS DATE) < DATE '$Q14End'),
       |agg AS (SELECT
       |    CAST(sum(CASE WHEN p_type = 'PROMO' THEN vol_u ELSE 0 END)
       |      AS BIGINT) AS promo_u,
       |    CAST(sum(vol_u) AS BIGINT) AS total_u FROM vol)
       |SELECT promo_u, total_u,
       |  CAST(promo_u * 1000000 // total_u AS BIGINT) AS promo_ppm
       |FROM agg""".stripMargin

  // -- q261: TPC-H Q15 (top supplier) ------------------------------------------
  // The view-over-aggregate + argmax shape: quarterly revenue per
  // supplier, then the supplier(s) hitting the maximum (ties all
  // surface, per spec). The max is a one-row frame cross-joined back
  // by broadcast — never a global sort of the aggregate; the integer
  // revenue grid makes the argmax deterministic.
  private val Q15Start = "1996-01-01"
  private val Q15End = "1996-04-01"

  private def q261(spark: SparkSession, sfDir: String): DataFrame = {
    val rev = moneyGrid(Tables.read(spark, sfDir, "lineitem")
        .where(to_date(col("l_shipdate")) >= lit(Q15Start).cast("date") &&
          to_date(col("l_shipdate")) < lit(Q15End).cast("date")))
      .groupBy(col("l_suppkey"))
      .agg(sum((col("ep_c") * (lit(100L) - col("d_c"))).cast(dec))
        .cast(LongType).as("total_revenue_u"))
      .localCheckpoint(true) // max pick + the equality re-filter
    val mx = rev.agg(max(col("total_revenue_u")).as("__mx"))
    rev.crossJoin(broadcast(mx))
      .where(col("total_revenue_u") === col("__mx"))
      .join(broadcast(Tables.read(spark, sfDir, "supplier")
          .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_u"))
      .orderBy(col("s_suppkey"))
  }

  private val q261Oracle: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
       |      AS BIGINT) AS total_revenue_u
       |  FROM lineitem
       |  WHERE CAST(l_shipdate AS DATE) >= DATE '$Q15Start'
       |    AND CAST(l_shipdate AS DATE) < DATE '$Q15End'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, total_revenue_u
       |FROM rev JOIN supplier ON s_suppkey = l_suppkey
       |WHERE total_revenue_u = (SELECT max(total_revenue_u) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  // -- q262: TPC-H Q17 (small-quantity-order revenue) --------------------------
  // The correlated-average filter: lineitems of one brand whose
  // quantity sits under 20% of their part's average quantity. The
  // per-part aggregate joins back on the part key (both sides already
  // brand-filtered — the broadcast part cut happens BEFORE either
  // pass), and the 0.2·avg comparison is the exact integer
  // cross-multiplication 5·qty·n < Σqty (quantities are integral in
  // the fixture), so no division ever happens.
  private val Q17Brand = "Brand#11"

  private def q262(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = Tables.read(spark, sfDir, "part")
      .where(col("p_brand") === Q17Brand).select(col("p_partkey"))
    val li = moneyGrid(Tables.read(spark, sfDir, "lineitem"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        col("l_quantity").cast(LongType).as("qty"), col("ep_c"))
      .localCheckpoint(true) // per-part stats + the row-level filter
    val perPart = li.groupBy(col("l_partkey").as("__pk"))
      .agg(sum(col("qty")).as("sum_q"), count(lit(1)).as("n_q"))
    li.join(broadcast(perPart), col("l_partkey") === col("__pk"))
      .where(col("qty") * lit(5L) * col("n_q") < col("sum_q"))
      .agg(sum(col("ep_c").cast(dec)).cast(LongType).as("sum_price_u"),
        count(lit(1)).as("n_small"))
      .select(col("sum_price_u"), col("n_small"),
        expr("sum_price_u div 7").as("avg_yearly_u"))
  }

  private val q262Oracle: String =
    s"""WITH li AS (
       |  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
       |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS ep_c
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_brand = '$Q17Brand'),
       |per AS (SELECT l_partkey AS pk,
       |    CAST(sum(qty) AS BIGINT) AS sum_q, count(*) AS n_q
       |  FROM li GROUP BY 1),
       |small AS (SELECT ep_c FROM li JOIN per ON l_partkey = pk
       |  WHERE qty * 5 * n_q < sum_q),
       |agg AS (SELECT CAST(sum(ep_c) AS BIGINT) AS sum_price_u,
       |    count(*) AS n_small FROM small)
       |SELECT sum_price_u, n_small,
       |  CAST(sum_price_u // 7 AS BIGINT) AS avg_yearly_u
       |FROM agg""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q255_tpch_q1", q255, Some(q255Oracle)),
    QueryDef("q256_tpch_q6", q256, Some(q256Oracle)),
    QueryDef("q257_tpch_q7", q257, Some(q257Oracle)),
    QueryDef("q258_tpch_q8", q258, Some(q258Oracle)),
    QueryDef("q259_tpch_q13", q259, Some(q259Oracle)),
    QueryDef("q260_tpch_q14", q260, Some(q260Oracle)),
    QueryDef("q261_tpch_q15", q261, Some(q261Oracle)),
    QueryDef("q262_tpch_q17", q262, Some(q262Oracle)))
}
