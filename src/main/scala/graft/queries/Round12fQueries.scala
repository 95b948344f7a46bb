package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 sixth wave: the correlated-subquery surface — scalar
  * correlated subqueries (Catalyst decorrelation) and the null-aware
  * NOT IN anti-join — exercised through `spark.sql` so the engine's
  * SQL front door is part of the driver gate.
  */
object Round12fQueries {

  /** Register the fixture tables this wave's SQL reads as temp views
    * (idempotent per session — `createOrReplaceTempView`).
    */
  private def views(spark: SparkSession, sfDir: String,
      names: String*): Unit =
    names.foreach(n =>
      Tables.read(spark, sfDir, n).createOrReplaceTempView(n))

  // -- q253: correlated scalar subqueries --------------------------------------
  // "Orders above their own customer's average" — the decorrelation
  // shape every SQL engine must plan well: two correlated scalar
  // subqueries (count + sum per customer) that Catalyst rewrites into
  // aggregate-join form, plus an EXISTS semi-join against lineitem.
  // The above-average test is the exact integer cross-multiplication
  // x·n > Σx (an avg() of doubles would be reduce-order-private), so
  // the result hashes identically on any layout. At scale the
  // decorrelated plan is one per-customer aggregate + one fact join —
  // the subquery syntax costs nothing physical.
  private def q253(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders", "lineitem")
    spark.sql(
      """SELECT o.o_custkey, count(*) AS n_above
        |FROM (SELECT o_orderkey, o_custkey,
        |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x_u
        |      FROM orders) o
        |WHERE o.x_u * (SELECT count(*) FROM orders o2
        |                WHERE o2.o_custkey = o.o_custkey)
        |    > (SELECT sum(CAST(floor(o2.o_totalprice * 100 + 0.5)
        |                 AS BIGINT))
        |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey)
        |GROUP BY 1
        |ORDER BY 1""".stripMargin)
  }

  private val q253Oracle: String =
    """SELECT o.o_custkey, count(*) AS n_above
      |FROM (SELECT o_orderkey, o_custkey,
      |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x_u
      |      FROM orders) o
      |WHERE o.x_u * (SELECT count(*) FROM orders o2
      |                WHERE o2.o_custkey = o.o_custkey)
      |    > (SELECT sum(CAST(floor(o2.o_totalprice * 100 + 0.5)
      |                 AS BIGINT))
      |       FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  // -- q254: null-aware NOT IN anti-join ---------------------------------------
  // The SQL-semantics trap q44's plain anti-join never touches: a
  // NOT IN whose subquery contains a NULL matches NOTHING (three-
  // valued logic), and Spark plans it as a dedicated null-aware
  // anti-join. Both branches run against a derived customer list
  // with a deterministically planted NULL (c_custkey % 50 = 0 →
  // NULL): the `with_null` count MUST be 0 rows' worth, while the
  // NULL-filtered branch behaves like a plain anti-join — the
  // engine-parity census of three-valued logic itself.
  private def q254(spark: SparkSession, sfDir: String): DataFrame = {
    views(spark, sfDir, "orders", "customer")
    spark.sql(
      """WITH probe AS (
        |  SELECT CASE WHEN c_custkey % 50 = 0 THEN CAST(NULL AS BIGINT)
        |              ELSE c_custkey END AS k
        |  FROM customer WHERE c_custkey % 2 = 0)
        |SELECT
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN (SELECT k FROM probe)) AS n_with_null,
        |  (SELECT count(*) FROM orders
        |   WHERE o_custkey NOT IN (SELECT k FROM probe
        |                           WHERE k IS NOT NULL))
        |    AS n_null_filtered,
        |  (SELECT count(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM probe p
        |                     WHERE p.k = o.o_custkey))
        |    AS n_not_exists""".stripMargin)
  }

  private val q254Oracle: String =
    """WITH probe AS (
      |  SELECT CASE WHEN c_custkey % 50 = 0 THEN CAST(NULL AS BIGINT)
      |              ELSE c_custkey END AS k
      |  FROM customer WHERE c_custkey % 2 = 0)
      |SELECT
      |  (SELECT count(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT k FROM probe)) AS n_with_null,
      |  (SELECT count(*) FROM orders
      |   WHERE o_custkey NOT IN (SELECT k FROM probe
      |                           WHERE k IS NOT NULL))
      |    AS n_null_filtered,
      |  (SELECT count(*) FROM orders o
      |   WHERE NOT EXISTS (SELECT 1 FROM probe p
      |                     WHERE p.k = o.o_custkey))
      |    AS n_not_exists""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q253_correlated_subquery", q253, Some(q253Oracle)),
    QueryDef("q254_null_aware_anti", q254, Some(q254Oracle)))
}
