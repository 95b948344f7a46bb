package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Round-10 seventh wave: the TPC-H Q3 star join, GROUPING SETS,
  * interval-range windows, null-safe join semantics, and
  * Merkle-style snapshot reconciliation.
  */
object Round10gQueries {

  // -- q170: TPC-H Q3 (shipping-priority star join) --------------------------
  // The canonical 3-table star: segment-filtered customers × orders
  // before the cutoff × lineitems shipped after it, top-10 orders by
  // revenue. Revenue is exact — cents × (100−discount-cents) integer
  // units (the q104 grid), so the top-10 boundary is layout-stable.
  // The plan wants: both filters pushed to their scans, customer
  // broadcast, one shuffle on the order key, TakeOrdered(10).
  private val Q3Cutoff = "1995-03-15"
  private val Q3Segment = "BUILDING"

  private def q170(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.read(spark, sfDir, "customer")
      .where(col("c_mktsegment") === Q3Segment).select("c_custkey")
    val orders = Tables.read(spark, sfDir, "orders")
      .where(to_date(col("o_orderdate")) < lit(Q3Cutoff).cast("date"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.read(spark, sfDir, "lineitem")
      .where(to_date(col("l_shipdate")) > lit(Q3Cutoff).cast("date"))
      .select(col("l_orderkey"),
        (floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long") *
          (lit(100L) - floor(col("l_discount") * 100 + lit(0.5)).cast("long")))
          .as("rev_u"))
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), to_date(col("o_orderdate")).as("odate"))
      .agg(sum(col("rev_u")).as("revenue_u"))
      .orderBy(col("revenue_u").desc, col("odate"), col("l_orderkey"))
      .limit(10)
  }

  private val q170Oracle: String =
    s"""SELECT l_orderkey,
       |  CAST(o_orderdate AS DATE) AS odate,
       |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
       |    AS revenue_u
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = '$Q3Segment'
       |  AND CAST(o_orderdate AS DATE) < DATE '$Q3Cutoff'
       |  AND CAST(l_shipdate AS DATE) > DATE '$Q3Cutoff'
       |GROUP BY 1, 2
       |ORDER BY revenue_u DESC, odate, l_orderkey LIMIT 10""".stripMargin

  // -- q171: GROUPING SETS with grouping_id ----------------------------------
  // The grouping-set shape rollup (q33) and cube (q45) can't express:
  // marginals by return flag and by line status WITHOUT the pairwise
  // cells, plus the grand total, each row tagged with the standard
  // bit-encoded grouping id. Exercises Spark's SQL surface (the
  // DataFrame API has no grouping-sets builder) against DuckDB's.
  private def q171(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.read(spark, sfDir, "lineitem")
      .createOrReplaceTempView("__q171_lineitem")
    spark.sql(
      """SELECT l_returnflag AS rf, l_linestatus AS ls,
        |  grouping_id(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS qty_u
        |FROM __q171_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, rf NULLS FIRST, ls NULLS FIRST""".stripMargin)
      .withColumn("gid", col("gid").cast("long"))
  }

  private val q171Oracle: String =
    """SELECT l_returnflag AS rf, l_linestatus AS ls,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS cnt,
      |  CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS qty_u
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY gid, rf NULLS FIRST, ls NULLS FIRST""".stripMargin

  // -- q172: interval-range trailing window ----------------------------------
  // Every prior window in the registry is a ROWS frame; this is the
  // RANGE-framed sibling a revenue dashboard needs: per customer, the
  // trailing-30-day order count and exact revenue as of each order
  // date. The order key is the epoch day (integer), so
  // `rangeBetween(-30, 0)` means the same closed day interval on both
  // engines — including same-day peer rows, which a ROWS frame would
  // split nondeterministically.
  private def q172(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        unix_date(to_date(col("o_orderdate"))).cast("long").as("eday"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("price_u"))
    val w = Window.partitionBy("o_custkey").orderBy("eday")
      .rangeBetween(-30, 0)
    o.withColumn("n_30d", count(lit(1)).over(w))
      .withColumn("rev_30d_u", sum(col("price_u")).over(w))
      .orderBy("o_custkey", "eday", "o_orderkey")
  }

  private val q172Oracle: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS eday,
      |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_u,
      |  count(*) OVER w AS n_30d,
      |  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) OVER w
      |    AS BIGINT) AS rev_30d_u
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |  ORDER BY CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
      |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, eday, o_orderkey""".stripMargin

  // -- q173: null-safe join semantics ----------------------------------------
  // The dimension-join trap: plain equality drops NULL keys silently;
  // the null-safe operator (<=> / IS NOT DISTINCT FROM) matches them.
  // NULLs are planted (segment 'BUILDING' nulled out), the segment
  // census carries a NULL row, and the gate verifies every nulled
  // customer still picks up its census count — a row count short by
  // the NULL group is the symptom this query pins.
  private def q173(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.read(spark, sfDir, "customer")
      .select(col("c_custkey"),
        nullif(col("c_mktsegment"), lit(Q3Segment)).as("seg"))
      .localCheckpoint(true) // feeds the census AND the probe side
    val census = cust.groupBy("seg").agg(count(lit(1)).as("seg_n"))
    cust.join(census.withColumnRenamed("seg", "seg_r"),
        col("seg") <=> col("seg_r"), "left")
      .select(col("c_custkey"), col("seg"), col("seg_n"))
      .orderBy("c_custkey")
  }

  private val q173Oracle: String =
    s"""WITH cust AS (SELECT c_custkey,
       |    nullif(c_mktsegment, '$Q3Segment') AS seg FROM customer),
       |census AS (SELECT seg, count(*) AS seg_n FROM cust GROUP BY 1)
       |SELECT c_custkey, cust.seg, seg_n
       |FROM cust LEFT JOIN census ON cust.seg IS NOT DISTINCT FROM census.seg
       |ORDER BY c_custkey""".stripMargin

  // -- q174: Merkle-style snapshot reconciliation ----------------------------
  // Anti-entropy between two table snapshots without a full-table
  // diff: each snapshot folds into 64 per-bucket digests (an
  // order-independent integer SUM of per-row hashes — mergeable,
  // partial-aggregable), the 64-row digest compare localizes the
  // damage, and only the CHANGED buckets pay the row-level diff —
  // at 100 TB the reconciliation scans everything once map-side but
  // joins only the ~1/64 slices that differ. Snapshot B plants
  // price bumps (id % 997 = 0) and deletes (id % 1999 = 0); output
  // is the per-changed-bucket damage report.
  private val MerkleBuckets = 64L

  private def q174(spark: SparkSession, sfDir: String): DataFrame = {
    val a = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderkey").as("id"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("p_u"),
        col("o_orderstatus").as("st"))
      .localCheckpoint(true) // snapshot A: digests + drill-down side
    val b = a.where(col("id") % 1999 =!= 0)
      .select(col("id"),
        when(col("id") % 997 === 0, col("p_u") + 1).otherwise(col("p_u"))
          .as("p_u"),
        col("st"))
      .localCheckpoint(true)
    def digests(df: DataFrame) = df
      .select((col("id") % MerkleBuckets).as("bucket"),
        TextOps.tokenHash(concat_ws("|", col("id"), col("p_u"), col("st")))
          .as("h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("h")).as("dig"))
    val changed = digests(a)
      .join(digests(b)
          .withColumnRenamed("n", "n_b").withColumnRenamed("dig", "dig_b"),
        Seq("bucket"), "full_outer")
      .where(!(col("dig") <=> col("dig_b")) || !(col("n") <=> col("n_b")))
      .select(col("bucket"), col("n").as("n_a"), col("n_b"))
      .localCheckpoint(true) // tiny changed-bucket list, reused twice
    // row-level drill-down restricted to the changed buckets
    val aIn = a.withColumn("bucket", col("id") % MerkleBuckets)
      .join(changed.select("bucket"), "bucket")
    val bIn = b.withColumn("bucket", col("id") % MerkleBuckets)
      .join(changed.select("bucket"), "bucket")
    val diff = aIn.select(col("bucket"), col("id"), col("p_u"), col("st"))
      .join(bIn.select(col("id"), col("p_u").as("p_b"), col("st").as("st_b")),
        Seq("id"), "full_outer")
      .where(!(col("p_u") <=> col("p_b")) || !(col("st") <=> col("st_b")))
      .groupBy("bucket").agg(count(lit(1)).as("n_diff_ids"))
    changed.join(diff, Seq("bucket"), "left")
      .select(col("bucket"), col("n_a"), col("n_b"),
        coalesce(col("n_diff_ids"), lit(0L)).as("n_diff_ids"))
      .orderBy("bucket")
  }

  private val q174Oracle: String = {
    val rowHash = TextOps.tokenHashSql(
      "concat_ws('|', id, p_u, st)")
    s"""WITH a AS (SELECT o_orderkey AS id,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS p_u,
       |    o_orderstatus AS st FROM orders),
       |b AS (SELECT id,
       |    CASE WHEN id % 997 = 0 THEN p_u + 1 ELSE p_u END AS p_u, st
       |  FROM a WHERE id % 1999 <> 0),
       |da AS (SELECT id % $MerkleBuckets AS bucket, count(*) AS n,
       |    CAST(sum($rowHash) AS BIGINT) AS dig
       |  FROM a GROUP BY 1),
       |db AS (SELECT id % $MerkleBuckets AS bucket, count(*) AS n_b,
       |    CAST(sum($rowHash) AS BIGINT) AS dig_b
       |  FROM b GROUP BY 1),
       |changed AS (SELECT coalesce(da.bucket, db.bucket) AS bucket,
       |    da.n AS n_a, db.n_b
       |  FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
       |  WHERE da.dig IS DISTINCT FROM db.dig_b
       |     OR da.n IS DISTINCT FROM db.n_b),
       |ain AS (SELECT a.* FROM a
       |  WHERE id % $MerkleBuckets IN (SELECT bucket FROM changed)),
       |bin AS (SELECT b.* FROM b
       |  WHERE id % $MerkleBuckets IN (SELECT bucket FROM changed)),
       |diff AS (SELECT coalesce(ain.id, bin.id) % $MerkleBuckets AS bucket,
       |    count(*) AS n_diff_ids
       |  FROM ain FULL OUTER JOIN bin ON ain.id = bin.id
       |  WHERE ain.p_u IS DISTINCT FROM bin.p_u
       |     OR ain.st IS DISTINCT FROM bin.st
       |  GROUP BY 1)
       |SELECT changed.bucket, n_a, n_b,
       |  CAST(coalesce(n_diff_ids, 0) AS BIGINT) AS n_diff_ids
       |FROM changed LEFT JOIN diff ON changed.bucket = diff.bucket
       |ORDER BY changed.bucket""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q170_tpch_q3", q170, Some(q170Oracle)),
    QueryDef("q171_grouping_sets", q171, Some(q171Oracle)),
    QueryDef("q172_range_window", q172, Some(q172Oracle)),
    QueryDef("q173_nullsafe_join", q173, Some(q173Oracle)),
    QueryDef("q174_merkle_diff", q174, Some(q174Oracle)))
}
