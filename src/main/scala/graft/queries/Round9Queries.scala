package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{LayoutOps, MixOps, ScdOps, SketchOps}

/** Round-9 additions: CDC log compaction and Count-Min heavy hitters. */
object Round9Queries {

  // -- q125: CDC log compaction ---------------------------------------------
  // A deterministic change log derived from orders (both engines build
  // the identical feed): key = o_custkey, offset = o_orderkey (unique,
  // totally ordered), every 7th offset is a delete, payload =
  // (o_totalprice, o_orderstatus). Current state = highest-offset
  // entry per key, gone if that entry is a delete — ONE map-side-
  // combining max_by aggregate (ScdOps.cdcApply).
  private def q125(spark: SparkSession, sfDir: String): DataFrame = {
    val log = Tables.read(spark, sfDir, "orders").select(
      col("o_custkey"), col("o_orderkey"),
      when(col("o_orderkey") % 7 === 0, "delete").otherwise("upsert").as("op"),
      col("o_totalprice"), col("o_orderstatus"))
    ScdOps.cdcApply(log, "o_custkey", "o_orderkey", "op",
        Seq("o_totalprice", "o_orderstatus"))
      .orderBy("o_custkey")
  }

  private val q125Oracle: String = {
    val log = "SELECT o_custkey, o_orderkey, CASE WHEN o_orderkey % 7 = 0 " +
      "THEN 'delete' ELSE 'upsert' END AS op, o_totalprice, o_orderstatus FROM orders"
    ScdOps.cdcApplySql(log, "o_custkey", "o_orderkey", "op",
      Seq("o_totalprice", "o_orderstatus")) + "\nORDER BY o_custkey"
  }

  // -- q126: Count-Min heavy hitters ----------------------------------------
  // Exact top-25 suppliers by lineitem rows, each verified against its
  // Count-Min estimate (4 x 1024 sketch, over_cnt = est - exact >= 0
  // by construction) — the sketch-vs-truth pattern of q62/q64/q99 for
  // the frequency-sketch family.
  private def q126(spark: SparkSession, sfDir: String): DataFrame =
    SketchOps.cmsTopK(Tables.read(spark, sfDir, "lineitem"),
      "l_suppkey", 25)

  private val q126Oracle: String =
    SketchOps.cmsTopKSql("lineitem", "l_suppkey", 25)

  // -- q127: bucketed co-located join ---------------------------------------
  // The 100 TB join strategy made demonstrable: orders and customer
  // are written as 8-bucket hash-bucketed, bucket-sorted tables on
  // o_custkey/c_custkey (LayoutOps.writeBucketed), then joined and
  // rolled up per market segment. Because both sides are bucketed by
  // the join key into the same bucket count, the SortMergeJoin reads
  // buckets pairwise and NEITHER SIDE SHUFFLES — the only exchange in
  // the plan is the 5-group segment rollup (plan-asserted). The merge
  // hint pins SMJ (a broadcast would hide the co-location the query
  // exists to prove). Revenue folds as floor(o_totalprice) BIGINTs so
  // the sum is order-independent and exact on both engines.
  private def q127(spark: SparkSession, sfDir: String): DataFrame = {
    val tag = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val (to, tc) = (s"graft_q127_orders_$tag", s"graft_q127_customer_$tag")
    LayoutOps.writeBucketed(
      Tables.read(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      to, s"/tmp/$to", "o_custkey", 8)
    LayoutOps.writeBucketed(
      Tables.read(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")),
      tc, s"/tmp/$tc", "c_custkey", 8)
    val ob = spark.table(to)
    val cb = spark.table(tc)
    ob.hint("merge").join(cb, ob("o_custkey") === cb("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice")).cast("long")).as("rev_floor"),
        max(col("o_custkey")).as("max_custkey"))
      .orderBy("c_mktsegment")
  }

  private val q127Oracle: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev_floor,
      |  max(o_custkey) AS max_custkey
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // -- q128: weighted sampling (A-ES) ---------------------------------------
  // Quality-weighted curation sampling: 20 docs per source, inclusion
  // probability rising in n_chars (the weight stand-in), every draw a
  // pure function of (doc_id, seed) — the deterministic
  // Efraimidis-Spirakis reservoir (MixOps.weightedSample).
  private val WsK = 20
  private val WsSeed = 42L

  private def q128(spark: SparkSession, sfDir: String): DataFrame =
    MixOps.weightedSample(Tables.read(spark, sfDir, "documents"),
      "doc_id", "source", "n_chars", WsK, WsSeed)

  private val q128Oracle: String =
    MixOps.weightedSampleSql("documents", "doc_id", "source", "n_chars",
      WsK, WsSeed)

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q125_cdc_apply", q125, Some(q125Oracle)),
    QueryDef("q126_cms_topk", q126, Some(q126Oracle)),
    QueryDef("q127_bucketed_join", q127, Some(q127Oracle)),
    QueryDef("q128_weighted_sample", q128, Some(q128Oracle)),
  )
}
