package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{LayoutOps, TextOps}

/** Round-10 closing wave: two compositions of proven machinery —
  * the dedup token-savings report and quantile score normalization
  * via the distributed global rank.
  */
object Round10lQueries {

  // -- q186: dedup token-savings report --------------------------------------
  // What exact dedup buys the token budget, per source: total tokens
  // referenced vs tokens after collapsing exact-duplicate texts
  // (every 7th doc re-referenced, the q162 planted corpus), and the
  // savings in ppm — the number a curation budget review actually
  // asks for. One distinct on (source, text) for the unique side;
  // token counts are map-side projections.
  private def q186(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val refs = d.select(col("source"), col("text"))
      .unionAll(d.where(col("doc_id") % 7 === 0)
        .select(col("source"), col("text")))
      .localCheckpoint(true) // totals AND the distinct side
    val tot = refs.groupBy("source")
      .agg(count(lit(1)).as("n_refs"),
        sum(TextOps.nTokens(col("text")).cast("long")).as("tok_total"))
    val uniq = refs.distinct().groupBy("source")
      .agg(count(lit(1)).as("n_unique"),
        sum(TextOps.nTokens(col("text")).cast("long")).as("tok_unique"))
    tot.join(uniq, "source")
      .select(col("source"), col("n_refs"), col("n_unique"),
        col("tok_total"), col("tok_unique"),
        expr("(tok_total - tok_unique) * 1000000 div tok_total")
          .as("savings_ppm"))
      .orderBy("source")
  }

  private val q186Oracle: String = {
    val nt = TextOps.nTokensSql("text")
    s"""WITH refs AS (SELECT source, text FROM documents
       |  UNION ALL SELECT source, text FROM documents WHERE doc_id % 7 = 0),
       |tot AS (SELECT source, count(*) AS n_refs,
       |    CAST(sum($nt) AS BIGINT) AS tok_total FROM refs GROUP BY 1),
       |u AS (SELECT source, count(*) AS n_unique,
       |    CAST(sum($nt) AS BIGINT) AS tok_unique
       |  FROM (SELECT DISTINCT source, text FROM refs) GROUP BY 1)
       |SELECT source, n_refs, n_unique, tok_total, tok_unique,
       |  (tok_total - tok_unique) * 1000000 // tok_total AS savings_ppm
       |FROM tot JOIN u USING (source) ORDER BY source""".stripMargin
  }

  // -- q187: quantile-normalized quality scores ------------------------------
  // Calibrating the q16 quality score into a corpus percentile
  // WITHOUT a single-partition window: the bucketed global rank
  // (q166's machinery) assigns every doc its total-order ordinal over
  // (score, doc_id), and pct_ppm = (rank−1)·1e6 div (n−1) — the
  // normalized score downstream thresholds actually compare across
  // corpora. Oracle is the naive global window.
  private def q187(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"),
        Norm.n4(TextOps.qualityScore(col("text"))).as("q4"))
    val n = scored.agg(count(lit(1)).as("__n"))
    LayoutOps.globalRank(scored, "q4", "doc_id", nBuckets = 16)
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("q4"),
        expr("(rank - 1) * 1000000 div (__n - 1)").as("pct_ppm"))
      .orderBy("doc_id")
  }

  private val q187Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH scored AS (SELECT doc_id,
       |    ${n4(TextOps.qualityScoreSql("text"))} AS q4 FROM documents),
       |r AS (SELECT doc_id, q4,
       |    row_number() OVER (ORDER BY q4, doc_id) AS rank,
       |    count(*) OVER () AS n FROM scored)
       |SELECT doc_id, q4, (rank - 1) * 1000000 // (n - 1) AS pct_ppm
       |FROM r ORDER BY doc_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q186_dedup_savings", q186, Some(q186Oracle)),
    QueryDef("q187_quantile_norm", q187, Some(q187Oracle)))
}
