package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Round-5 operators: seeded deterministic shuffle+shard (the
  * data-mixing primitive a training pipeline uses to produce
  * reproducible example order and shard files).
  */
object Round5Queries {

  // -- q66: seeded deterministic shuffle + shard --------------------------
  // MixOps.shuffleShard over documents: shard + intra-shard position are
  // pure functions of (doc_id, seed), reproduced exactly by the DuckDB
  // oracle through the same overflow-safe Lehmer arithmetic. Re-running
  // with the same seed re-creates identical shards on any engine or
  // cluster size.
  private val Seed = 42L
  private val NShards = 8

  private def q66(spark: SparkSession, sfDir: String): DataFrame =
    MixOps.shuffleShard(
      Tables.read(spark, sfDir, "documents").select("doc_id"),
      "doc_id", Seed, NShards)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")

  private val q66Oracle: String =
    s"""WITH h1 AS (
       |  SELECT doc_id,
       |    ((doc_id % ${MixOps.P} + $Seed) * 48271) % ${MixOps.P} AS h1
       |  FROM documents
       |), s AS (
       |  SELECT doc_id, CAST(h1 % $NShards AS INTEGER) AS shard,
       |    ((h1 + 1) * 69621) % ${MixOps.P} AS h2
       |  FROM h1
       |)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h2, doc_id)
       |       AS INTEGER) AS pos
       |FROM s ORDER BY shard, pos""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q66_shuffle_shard", q66, Some(q66Oracle)),
  )
}
