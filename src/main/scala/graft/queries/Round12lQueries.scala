package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Round-12 twelfth wave: the ten TPC-H plan shapes the fixture could
  * not host verbatim (Q2, Q4, Q9, Q11, Q12, Q16, Q19, Q20, Q21, Q22)
  * — closing out full 22/22 TPC-H coverage. Two documented
  * adaptations make them expressible, both deterministic and rendered
  * IDENTICALLY on both engines so every hash gate still bites:
  *
  *  - **Derived partsupp** (the fixture ships no partsupp table): per
  *    (l_partkey, l_suppkey) over lineitem, `ps_availqty` = Σ quantity
  *    and `ps_cost_u` = min unit price in cents (`ep_c div qty` —
  *    quantities are whole in the fixture and both engines
  *    floor-divide positives identically). Used by Q2/Q9/Q11/Q16/Q20.
  *  - **Missing-column stand-ins**: lateness = `l_shipdate >
  *    o_orderdate + N days` (no commit/receipt dates) for Q4/Q12/Q21;
  *    Q12's ship-mode group key is `l_returnflag`; Q16's
  *    complaint-supplier set is `s_suppkey % 10 = 3`; Q19's container
  *    windows ride `p_size`; Q22's country code is `c_nationkey` and
  *    its "no orders in 7 years" dormancy is "no orders since
  *    2000-01-01" (the fixture's order history ends 2001-08).
  *
  * All money math rides the repo's exact integer grids (cents ×
  * (100 − discount-cents)), partials that can wrap a BIGINT at 100 TB
  * accumulate in DECIMAL(38,0) from the first merge, and every ratio
  * or threshold is an integer cross-multiplication — no runtime
  * floating point anywhere.
  */
object Round12lQueries {

  private val dec = DecimalType(38, 0)

  /** Land the two partsupp inputs on the integer grid: whole-unit
    * quantity and extended price in cents.
    */
  private def psGrid(li: DataFrame): DataFrame =
    li.select(col("l_partkey"), col("l_suppkey"),
      col("l_quantity").cast(LongType).as("qty"),
      floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType)
        .as("ep_c"))

  /** Derived partsupp over a [[psGrid]]-shaped slice — callers prune
    * the part side FIRST (broadcast join) so the one fact shuffle the
    * derivation costs only carries surviving rows.
    */
  private def partsupp(gridded: DataFrame): DataFrame =
    gridded
      .groupBy(col("l_partkey").as("ps_pk"), col("l_suppkey").as("ps_sk"))
      .agg(sum(col("qty")).as("ps_availqty"),
        min(expr("ep_c div qty")).as("ps_cost_u"))

  /** The same derivation in DuckDB, over an arbitrary FROM source. */
  private def psSql(liSrc: String): String =
    s"""SELECT l_partkey AS ps_pk, l_suppkey AS ps_sk,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_availqty,
       |    CAST(min(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |      // CAST(l_quantity AS BIGINT)) AS BIGINT) AS ps_cost_u
       |  FROM $liSrc GROUP BY 1, 2""".stripMargin

  /** Suppliers of one region with the columns Q2/Q11/Q20/Q21 need —
    * a dimension chain (region → nation → supplier), every hop
    * broadcast: at 100 TB supplier is ~10M rows × 3 columns, still a
    * broadcast dimension next to the fact.
    */
  private def regionSuppliers(spark: SparkSession, sfDir: String,
      rName: String): DataFrame = {
    val nat = Tables.read(spark, sfDir, "nation")
      .join(broadcast(Tables.read(spark, sfDir, "region")
          .where(col("r_name") === rName).select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    Tables.read(spark, sfDir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        floor(col("s_acctbal") * 100 + lit(0.5)).cast(LongType)
          .as("s_acctbal_c"))
  }

  private def regionSuppSql(rName: String): String =
    s"""SELECT s_suppkey, s_name, n_name,
       |    CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS s_acctbal_c
       |  FROM supplier JOIN nation ON n_nationkey = s_nationkey
       |  JOIN region ON r_regionkey = n_regionkey
       |  WHERE r_name = '$rName'""".stripMargin

  // -- q279: TPC-H Q2 (minimum-cost supplier) ----------------------------------
  // The correlated-min shape: for every '%bolt' part, the EUROPE
  // supplier(s) quoting the minimum derived supply cost (ties all
  // surface, per spec). The part prune broadcasts BEFORE the partsupp
  // derivation, the region dimension chain broadcasts, and the min
  // joins back on the part key — at 100 TB the only shuffles are the
  // (pk, sk) derivation groupBy and the part-keyed min join-back,
  // both on already-pruned rows.
  private val Q2Region = "EUROPE"
  private val Q2NounLike = "%bolt"

  private def q279(spark: SparkSession, sfDir: String): DataFrame = {
    val esupp = regionSuppliers(spark, sfDir, Q2Region)
    val bolts = Tables.read(spark, sfDir, "part")
      .where(col("p_name").like(Q2NounLike)).select(col("p_partkey"))
    val cand = partsupp(psGrid(
        Tables.read(spark, sfDir, "lineitem")
          .join(broadcast(bolts), col("l_partkey") === col("p_partkey"))))
      .join(broadcast(esupp.select(col("s_suppkey").as("__ek"))),
        col("ps_sk") === col("__ek"), "left_semi")
      .select(col("ps_pk"), col("ps_sk"), col("ps_cost_u"))
    val minc = cand.groupBy(col("ps_pk").as("__mpk"))
      .agg(min(col("ps_cost_u")).as("__mc"))
    cand.join(minc,
        col("ps_pk") === col("__mpk") && col("ps_cost_u") === col("__mc"))
      .join(broadcast(esupp), col("ps_sk") === col("s_suppkey"))
      .select(col("s_acctbal_c"), col("s_name"), col("n_name"),
        col("ps_pk").as("p_partkey"), col("ps_cost_u"))
      .orderBy(col("s_acctbal_c").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  private val q279Oracle: String =
    s"""WITH esupp AS (${regionSuppSql(Q2Region)}),
       |ps AS (${psSql(
          s"lineitem JOIN part ON p_partkey = l_partkey\n" +
          s"    WHERE p_name LIKE '$Q2NounLike'")}),
       |cand AS (SELECT ps_pk, ps_sk, ps_cost_u FROM ps
       |  WHERE ps_sk IN (SELECT s_suppkey FROM esupp)),
       |minc AS (SELECT ps_pk AS mpk, min(ps_cost_u) AS mc
       |  FROM cand GROUP BY 1)
       |SELECT s_acctbal_c, s_name, n_name, ps_pk AS p_partkey, ps_cost_u
       |FROM cand JOIN minc ON ps_pk = mpk AND ps_cost_u = mc
       |JOIN esupp ON s_suppkey = ps_sk
       |ORDER BY s_acctbal_c DESC, n_name, s_name, p_partkey""".stripMargin

  // -- q280: TPC-H Q4 (order-priority checking) --------------------------------
  // The EXISTS semi-join shape: orders of one quarter having at least
  // one line shipped > 30 days after the order date (the fixture's
  // lateness stand-in — no commit/receipt dates). The quarter filter
  // prunes orders before the semi join, the semi join never
  // duplicates an order however many late lines it has, and the
  // priority rollup is a 5-row map-side aggregate.
  private val Q4Start = "1996-01-01"
  private val Q4End = "1996-04-01"
  private val Q4LateDays = 30

  private def q280(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
      .where(to_date(col("o_orderdate")) >= lit(Q4Start).cast("date") &&
        to_date(col("o_orderdate")) < lit(Q4End).cast("date"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val li = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $Q4LateDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  private val q280Oracle: String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE CAST(o_orderdate AS DATE) >= DATE '$Q4Start'
       |  AND CAST(o_orderdate AS DATE) < DATE '$Q4End'
       |  AND EXISTS (SELECT 1 FROM lineitem
       |    WHERE l_orderkey = o_orderkey
       |      AND l_shipdate > o_orderdate + INTERVAL $Q4LateDays DAY)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q281: TPC-H Q9 (product-type profit) ------------------------------------
  // The multi-dimension profit rollup: revenue minus derived supply
  // cost per (supplier nation, order year) over 'red%' parts. The
  // part prune broadcasts FIRST (so both the fact slice and the
  // partsupp derivation only see red parts), the supplier→nation
  // chain broadcasts, and the one fact-fact shuffle is the order-key
  // join. Per-row profit terms reach ~1e11 (three factor-100 grids),
  // so partials accumulate in DECIMAL(38,0) from the first merge —
  // the q233/q151 BIGINT-wrap class.
  private val Q9NameLike = "red%"

  private def q281(spark: SparkSession, sfDir: String): DataFrame = {
    val redp = Tables.read(spark, sfDir, "part")
      .where(col("p_name").like(Q9NameLike)).select(col("p_partkey"))
    val li = Tables.read(spark, sfDir, "lineitem")
      .join(broadcast(redp), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast(LongType).as("qty"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType)
          .as("ep_c"),
        floor(col("l_discount") * 100 + lit(0.5)).cast(LongType)
          .as("d_c"))
      .localCheckpoint(true) // feeds both the ps derivation and the fact join
    val ps = partsupp(li.select(col("l_partkey"), col("l_suppkey"),
      col("qty"), col("ep_c")))
    val snat = Tables.read(spark, sfDir, "supplier")
      .join(broadcast(Tables.read(spark, sfDir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    li.join(ps, col("l_partkey") === col("ps_pk") &&
        col("l_suppkey") === col("ps_sk"))
      .join(Tables.read(spark, sfDir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(snat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name").as("nation"),
        year(to_date(col("o_orderdate"))).cast(LongType).as("o_year"))
      .agg(sum((col("ep_c") * (lit(100L) - col("d_c")) -
          col("ps_cost_u") * col("qty") * lit(100L)).cast(dec))
        .cast(LongType).as("sum_profit_u"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  private val q281Oracle: String =
    s"""WITH ps AS (${psSql(
          s"lineitem JOIN part ON p_partkey = l_partkey\n" +
          s"    WHERE p_name LIKE '$Q9NameLike'")})
       |SELECT n_name AS nation,
       |  CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS o_year,
       |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
       |    - ps_cost_u * CAST(l_quantity AS BIGINT) * 100) AS BIGINT)
       |    AS sum_profit_u
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN ps ON ps_pk = l_partkey AND ps_sk = l_suppkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE p_name LIKE '$Q9NameLike'
       |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin

  // -- q282: TPC-H Q11 (important stock identification) ------------------------
  // The HAVING-over-global-fraction shape: per-part derived stock
  // value within one region's suppliers, keeping parts whose value
  // exceeds 2× the mean share. TPC-H's fixed 0.0001 fraction is
  // scale-dependent (more parts → every share shrinks → empty at big
  // SF), so the threshold is self-normalizing — value · n_parts >
  // 2 · total — evaluated as a DECIMAL cross-multiplication (the
  // BIGINT product wraps at 100 TB part counts). The global total is
  // a one-row broadcast back over the part-keyed aggregate.
  private val Q11Region = "EUROPE"

  private def q282(spark: SparkSession, sfDir: String): DataFrame = {
    val scoped = partsupp(psGrid(Tables.read(spark, sfDir, "lineitem")))
      .join(broadcast(regionSuppliers(spark, sfDir, Q11Region)
          .select(col("s_suppkey").as("__ek"))),
        col("ps_sk") === col("__ek"), "left_semi")
      .select(col("ps_pk"),
        (col("ps_cost_u") * col("ps_availqty")).as("value_u"))
      .localCheckpoint(true) // feeds the total and the per-part rollup
    val tot = scoped.agg(
      sum(col("value_u").cast(dec)).as("__total_u"),
      countDistinct(col("ps_pk")).as("__n_parts"))
    scoped.groupBy(col("ps_pk").as("p_partkey"))
      .agg(sum(col("value_u").cast(dec)).as("__v"))
      .crossJoin(broadcast(tot))
      .where(col("__v") * col("__n_parts") > col("__total_u") * lit(2L))
      .select(col("p_partkey"), col("__v").cast(LongType).as("value_u"))
      .orderBy(col("value_u").desc, col("p_partkey"))
  }

  private val q282Oracle: String =
    s"""WITH ps AS (${psSql("lineitem")}),
       |scoped AS (SELECT ps_pk, ps_cost_u * ps_availqty AS value_u
       |  FROM ps WHERE ps_sk IN
       |    (SELECT s_suppkey FROM (${regionSuppSql(Q11Region)}) rs)),
       |tot AS (SELECT sum(value_u) AS total_u,
       |  count(DISTINCT ps_pk) AS n_parts FROM scoped)
       |SELECT ps_pk AS p_partkey, CAST(sum(value_u) AS BIGINT) AS value_u
       |FROM scoped, tot GROUP BY 1, total_u, n_parts
       |HAVING sum(value_u) * n_parts > 2 * total_u
       |ORDER BY value_u DESC, p_partkey""".stripMargin

  // -- q283: TPC-H Q12 (shipping-priority classes) -----------------------------
  // The CASE-count rollup over a fact-fact join: 1996-shipped lines
  // that ran late (> 60 days after order date), split urgent/other by
  // order priority and grouped by the return-flag stand-in for ship
  // mode. The ship-year prune hits the lineitem scan; the order-key
  // join is the one shuffle; the 3-row rollup is map-side.
  private val Q12Year = "1996"
  private val Q12LateDays = 60

  private def q283(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.read(spark, sfDir, "lineitem")
      .where(col("l_shipdate") >= s"$Q12Year-01-01" &&
        col("l_shipdate") < s"${Q12Year.toInt + 1}-01-01")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
    val o = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(o, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $Q12LateDays DAYS"))
      .groupBy(col("l_returnflag").as("ship_class"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  private val q283Oracle: String =
    s"""SELECT l_returnflag AS ship_class,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |WHERE l_shipdate >= TIMESTAMP '$Q12Year-01-01'
       |  AND l_shipdate < TIMESTAMP '${Q12Year.toInt + 1}-01-01'
       |  AND l_shipdate > o_orderdate + INTERVAL $Q12LateDays DAY
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q284: TPC-H Q16 (parts/supplier relationship) ---------------------------
  // The count-distinct + NOT-IN shape: how many distinct suppliers
  // offer each surviving (brand, type, size) combination, excluding
  // the complaint-supplier stand-in set via a broadcast anti join.
  // The part filters prune before the partsupp derivation; the
  // count-distinct groups on the 3-column part descriptor.
  private val Q16BrandNot = "Brand#3"
  private val Q16TypeNotLike = "PROMO%"
  private val Q16Sizes = Seq(1, 9, 14, 19, 23, 36, 45, 49)

  private def q284(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = Tables.read(spark, sfDir, "part")
      .where(col("p_brand") =!= Q16BrandNot &&
        !col("p_type").like(Q16TypeNotLike) &&
        col("p_size").isin(Q16Sizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    val bad = Tables.read(spark, sfDir, "supplier")
      .where(col("s_suppkey") % 10 === 3).select(col("s_suppkey"))
    partsupp(psGrid(Tables.read(spark, sfDir, "lineitem")
        .join(broadcast(pt.select(col("p_partkey").as("__pp"))),
          col("l_partkey") === col("__pp"), "left_semi")))
      .join(broadcast(bad), col("ps_sk") === col("s_suppkey"), "left_anti")
      .join(broadcast(pt), col("ps_pk") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("ps_sk")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  private val q284Oracle: String =
    s"""WITH pt AS (SELECT p_partkey, p_brand, p_type, p_size FROM part
       |  WHERE p_brand <> '$Q16BrandNot'
       |    AND p_type NOT LIKE '$Q16TypeNotLike'
       |    AND p_size IN (${Q16Sizes.mkString(", ")})),
       |ps AS (${psSql(
          "lineitem WHERE l_partkey IN (SELECT p_partkey FROM pt)")})
       |SELECT p_brand, p_type, p_size,
       |  count(DISTINCT ps_sk) AS supplier_cnt
       |FROM ps JOIN pt ON p_partkey = ps_pk
       |WHERE ps_sk NOT IN
       |  (SELECT s_suppkey FROM supplier WHERE s_suppkey % 10 = 3)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  // -- q285: TPC-H Q19 (discounted revenue, disjunctive predicate) -------------
  // The OR-of-conjunctions pushdown showcase: three (brand,
  // size-window, quantity-window) branches. Each side prefilters to
  // the UNION BOUND of its branch conditions (brand ∈ the 3-set,
  // size ≤ 35, quantity ∈ [1, 30] — these reach the scans), the part
  // side broadcasts, and the exact disjunction evaluates as the
  // residual join filter. Revenue partials accumulate in
  // DECIMAL(38,0).
  private val Q19B1 = "Brand#12"
  private val Q19B2 = "Brand#23"
  private val Q19B3 = "Brand#34"

  private def q285(spark: SparkSession, sfDir: String): DataFrame = {
    val pt = Tables.read(spark, sfDir, "part")
      .where(col("p_brand").isin(Q19B1, Q19B2, Q19B3) &&
        col("p_size").between(1, 35))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val li = Tables.read(spark, sfDir, "lineitem")
      .where(col("l_quantity").between(1, 30))
      .select(col("l_partkey"),
        col("l_quantity").cast(LongType).as("qty"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType)
          .as("ep_c"),
        floor(col("l_discount") * 100 + lit(0.5)).cast(LongType)
          .as("d_c"))
    val branch =
      (col("p_brand") === Q19B1 && col("p_size").between(1, 15) &&
        col("qty").between(1L, 11L)) ||
      (col("p_brand") === Q19B2 && col("p_size").between(1, 25) &&
        col("qty").between(10L, 20L)) ||
      (col("p_brand") === Q19B3 && col("p_size").between(1, 35) &&
        col("qty").between(20L, 30L))
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .where(branch)
      .agg(sum((col("ep_c") * (lit(100L) - col("d_c"))).cast(dec))
          .cast(LongType).as("revenue_u"),
        count(lit(1)).as("n_rows"))
  }

  private val q285Oracle: String =
    s"""SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
       |    AS BIGINT) AS revenue_u,
       |  count(*) AS n_rows
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = '$Q19B1' AND p_size BETWEEN 1 AND 15
       |    AND l_quantity BETWEEN 1 AND 11)
       |  OR (p_brand = '$Q19B2' AND p_size BETWEEN 1 AND 25
       |    AND l_quantity BETWEEN 10 AND 20)
       |  OR (p_brand = '$Q19B3' AND p_size BETWEEN 1 AND 35
       |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // -- q286: TPC-H Q20 (potential part promotion) ------------------------------
  // The nested-semi-with-aggregate-threshold shape: ASIA suppliers
  // holding derived stock of a 'blue%' part exceeding 8× what they
  // shipped of it in 1996. One pass over the part-pruned fact
  // computes availqty, the 1996-shipped quantity AND the
  // shipped-at-all flag together (TPC-H's correlated scalar subquery
  // returns NULL — i.e. excludes — pairs with no 1996 shipments, so
  // n96 > 0 is part of the predicate), then a distinct-supplier semi
  // join into the broadcast region dimension.
  private val Q20Region = "ASIA"
  private val Q20NameLike = "blue%"
  private val Q20Mult = 8

  private def q286(spark: SparkSession, sfDir: String): DataFrame = {
    val bluep = Tables.read(spark, sfDir, "part")
      .where(col("p_name").like(Q20NameLike)).select(col("p_partkey"))
    val in96 = col("l_shipdate") >= "1996-01-01" &&
      col("l_shipdate") < "1997-01-01"
    val good = Tables.read(spark, sfDir, "lineitem")
      .join(broadcast(bluep), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast(LongType).as("qty"),
        when(in96, 1L).otherwise(0L).as("in96"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("qty")).as("availqty"),
        sum(col("qty") * col("in96")).as("q96"),
        sum(col("in96")).as("n96"))
      .where(col("n96") > 0L &&
        col("availqty") > lit(Q20Mult.toLong) * col("q96"))
      .select(col("l_suppkey")).distinct()
    Tables.read(spark, sfDir, "supplier")
      .join(good.withColumnRenamed("l_suppkey", "__gk"),
        col("s_suppkey") === col("__gk"), "left_semi")
      .join(broadcast(regionSuppliers(spark, sfDir, Q20Region)
          .select(col("s_suppkey").as("__rk"))),
        col("s_suppkey") === col("__rk"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  private val q286Oracle: String =
    s"""WITH bl AS (SELECT l_partkey, l_suppkey,
       |    CAST(l_quantity AS BIGINT) AS qty,
       |    CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
       |      AND l_shipdate < TIMESTAMP '1997-01-01'
       |      THEN 1 ELSE 0 END AS in96
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_name LIKE '$Q20NameLike'),
       |ag AS (SELECT l_partkey, l_suppkey,
       |    CAST(sum(qty) AS BIGINT) AS availqty,
       |    CAST(sum(qty * in96) AS BIGINT) AS q96,
       |    CAST(sum(in96) AS BIGINT) AS n96
       |  FROM bl GROUP BY 1, 2),
       |good AS (SELECT DISTINCT l_suppkey FROM ag
       |  WHERE n96 > 0 AND availqty > $Q20Mult * q96)
       |SELECT s_suppkey, s_name
       |FROM supplier JOIN good ON l_suppkey = s_suppkey
       |WHERE s_suppkey IN
       |  (SELECT s_suppkey FROM (${regionSuppSql(Q20Region)}) rs)
       |ORDER BY s_suppkey""".stripMargin

  // -- q287: TPC-H Q21 (suppliers who kept orders waiting) ---------------------
  // The semi + anti double-exists shape: AMERICA suppliers who were
  // the SOLE late shipper (> 60 days after order date) on a finished
  // multi-supplier order. The late set reduces to distinct
  // (order, supplier) pairs before any exists-logic; the
  // "another supplier participated" semi join and the "no other
  // supplier was late" anti join are both order-keyed equi joins with
  // a supplier-inequality residual — never a pair fan-out. The
  // region prune hits the l1 side FIRST (spec: l2/l3 range over ALL
  // suppliers, so those sides stay unpruned).
  private val Q21Region = "AMERICA"
  private val Q21LateDays = 60

  private def q287(spark: SparkSession, sfDir: String): DataFrame = {
    val amer = regionSuppliers(spark, sfDir, Q21Region)
      .select(col("s_suppkey"), col("s_name"))
    val ordF = Tables.read(spark, sfDir, "orders")
      .where(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val late = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(ordF, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >
          col("o_orderdate") + expr(s"INTERVAL $Q21LateDays DAYS"))
      .select(col("l_orderkey").as("lok"), col("l_suppkey").as("lsk"))
      .distinct()
      .localCheckpoint(true) // probed three ways below
    val l1 = late.join(broadcast(amer.select(col("s_suppkey").as("__ak"))),
      col("lsk") === col("__ak"), "left_semi")
    val alls = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("aok"), col("l_suppkey").as("ask"))
      .distinct()
    val waited = l1
      .join(alls, col("aok") === col("lok") && col("ask") =!= col("lsk"),
        "left_semi")
      .join(late.select(col("lok").as("l2ok"), col("lsk").as("l2sk")),
        col("l2ok") === col("lok") && col("l2sk") =!= col("lsk"),
        "left_anti")
    waited.join(broadcast(amer), col("lsk") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  private val q287Oracle: String =
    s"""WITH late AS (SELECT DISTINCT l_orderkey AS lok, l_suppkey AS lsk
       |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |  WHERE o_orderstatus = 'F'
       |    AND l_shipdate > o_orderdate + INTERVAL $Q21LateDays DAY),
       |alls AS (SELECT DISTINCT l_orderkey AS aok, l_suppkey AS ask
       |  FROM lineitem)
       |SELECT s_name, count(*) AS numwait
       |FROM late JOIN (${regionSuppSql(Q21Region)}) rs ON s_suppkey = lsk
       |WHERE EXISTS (SELECT 1 FROM alls
       |    WHERE aok = lok AND ask <> lsk)
       |  AND NOT EXISTS (SELECT 1 FROM late l2
       |    WHERE l2.lok = late.lok AND l2.lsk <> late.lsk)
       |GROUP BY 1 ORDER BY numwait DESC, s_name""".stripMargin

  // -- q288: TPC-H Q22 (global sales opportunity) ------------------------------
  // The scalar-subquery + anti-join shape: customers of seven
  // country codes (c_nationkey stands in for the phone prefix) whose
  // balance beats the positive-balance mean, with no orders since
  // 2000-01-01 (the dormancy stand-in — the fixture's history ends
  // 2001-08, so TPC-H's "no orders at all" is empty here). The mean
  // is a one-row broadcast compared by integer cross-multiplication
  // (acct_c · n > Σ acct_c — never a float division); the date prune
  // shrinks the anti-join's orders side before it shuffles.
  private val Q22Nations = Seq(2, 5, 8, 11, 14, 17, 20)
  private val Q22Cut = "2000-01-01"

  private def q288(spark: SparkSession, sfDir: String): DataFrame = {
    val elig = Tables.read(spark, sfDir, "customer")
      .where(col("c_nationkey").isin(Q22Nations: _*))
      .select(col("c_custkey"), col("c_nationkey"),
        floor(col("c_acctbal") * 100 + lit(0.5)).cast(LongType)
          .as("acct_c"))
      .localCheckpoint(true) // feeds the mean and the rich filter
    val avgpos = elig.where(col("acct_c") > 0L)
      .agg(sum(col("acct_c")).as("__sum_c"), count(lit(1)).as("__n_c"))
    val recent = Tables.read(spark, sfDir, "orders")
      .where(to_date(col("o_orderdate")) >= lit(Q22Cut).cast("date"))
      .select(col("o_custkey"))
    elig.crossJoin(broadcast(avgpos))
      .where(col("acct_c") * col("__n_c") > col("__sum_c"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum(col("acct_c")).as("totacctbal_c"))
      .orderBy(col("cntrycode"))
  }

  private val q288Oracle: String =
    s"""WITH elig AS (SELECT c_custkey, c_nationkey,
       |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acct_c
       |  FROM customer
       |  WHERE c_nationkey IN (${Q22Nations.mkString(", ")})),
       |avgpos AS (SELECT CAST(sum(acct_c) AS BIGINT) AS sum_c,
       |    count(*) AS n_c FROM elig WHERE acct_c > 0)
       |SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       |  CAST(sum(acct_c) AS BIGINT) AS totacctbal_c
       |FROM elig, avgpos
       |WHERE acct_c * n_c > sum_c
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND CAST(o_orderdate AS DATE) >= DATE '$Q22Cut')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q279_tpch_q2", q279, Some(q279Oracle)),
    QueryDef("q280_tpch_q4", q280, Some(q280Oracle)),
    QueryDef("q281_tpch_q9", q281, Some(q281Oracle)),
    QueryDef("q282_tpch_q11", q282, Some(q282Oracle)),
    QueryDef("q283_tpch_q12", q283, Some(q283Oracle)),
    QueryDef("q284_tpch_q16", q284, Some(q284Oracle)),
    QueryDef("q285_tpch_q19", q285, Some(q285Oracle)),
    QueryDef("q286_tpch_q20", q286, Some(q286Oracle)),
    QueryDef("q287_tpch_q21", q287, Some(q287Oracle)),
    QueryDef("q288_tpch_q22", q288, Some(q288Oracle)))
}
