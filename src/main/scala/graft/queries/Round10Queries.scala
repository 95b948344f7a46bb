package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.DedupOps

/** Round-10 additions: substring-granular dedup. */
object Round10Queries {

  // -- q138: repeated k-gram span dedup --------------------------------------
  // The one LLM-dedup family doc-level dedup can't reach (VERDICT r9
  // #4): substring-granular repeated-text detection, Lee et al. 2022
  // shape (arXiv:2107.06499), as corpus-wide hot-k-gram spans. The
  // fixture corpus carries real repeated 8-grams (~1k at sf0.01), and
  // both engines additionally plant the SAME 16-token license
  // paragraph on every 4th doc (the q89/q90 planted-dirt discipline)
  // so the gate exercises multi-gram interval MERGING — the planted
  // paragraph's 9 overlapping hot 8-grams collapse into ONE leading
  // span per planted doc (extending past token 15 where nearby body
  // grams are also hot — gap ≤ k merges by design), not nine
  // one-gram rows. Spans are returned as data
  // (0-based inclusive token indices), never applied — cut vs drop
  // vs downweight is pipeline policy, not operator semantics.
  private val SpanK = 8
  private val SpanMinRepeats = 2L
  private val LicensePara = "this corpus is released under the example " +
    "open license and may be copied freely with attribution to the source"

  private def plantedDocs(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(lit(LicensePara + " "), col("text")))
        .otherwise(col("text")).as("t"))

  private def q138(spark: SparkSession, sfDir: String): DataFrame =
    DedupOps.repeatedKgramSpans(plantedDocs(spark, sfDir), "doc_id", "t",
        SpanK, SpanMinRepeats)
      .orderBy("doc_id", "span_start")

  private val q138Oracle: String = {
    val planted =
      s"__planted AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 " +
        s"THEN '$LicensePara ' || text ELSE text END AS t FROM documents)"
    DedupOps.repeatedKgramSpansSql("__planted", "doc_id", "t",
      SpanK, SpanMinRepeats, extraCtes = planted) +
      "\nORDER BY doc_id, span_start"
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q138_substring_dedup", q138, Some(q138Oracle)))
}
