package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{ScdOps, SketchOps}

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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q125_cdc_apply", q125, Some(q125Oracle)),
    QueryDef("q126_cms_topk", q126, Some(q126Oracle)),
  )
}
