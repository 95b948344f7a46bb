package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, MixOps, MultimodalOps, TextOps}

/** Round-11 third wave: JPEG marker-walk metadata, the
  * right-to-be-forgotten erasure audit, and the training-data freeze
  * manifest capstone.
  */
object Round11cQueries {

  // -- q198: JPEG metadata census -----------------------------------------------
  // The third container family (after PNG q143 big-endian-fixed and
  // WAV q145 little-endian-fixed), and the structurally hardest: JPEG
  // dimensions sit behind a VARIABLE-length marker chain, so the
  // parser must walk segments (see MultimodalKernels.jpegDims) — the
  // comLen term below varies the chain per row, so a fixed-offset
  // reader fails on almost every payload. Census by aspect shape;
  // sum_bytes cross-checks the synthesized segment lengths.
  private def q198(spark: SparkSession, sfDir: String): DataFrame = {
    val payload = MultimodalOps.jpegHeader(
      col("p_partkey") % 2000 + 16, (col("p_partkey") * 7) % 2000 + 16,
      col("p_partkey") % 32, col("p_partkey") % 23 =!= 0)
    val dims = MultimodalOps.jpegDims(col("payload"))
    Tables.read(spark, sfDir, "part")
      .select(col("p_partkey"), payload.as("payload"))
      .select(col("p_partkey"), dims.as("__d"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .select(
        when(col("__d").isNull, "INVALID")
          .when(col("__d").getItem(0) > col("__d").getItem(1), "landscape")
          .when(col("__d").getItem(0) < col("__d").getItem(1), "portrait")
          .otherwise("square").as("shape"),
        coalesce(col("__d").getItem(0) * col("__d").getItem(1), lit(0L))
          .as("area"),
        col("__d").getItem(0).as("w"), col("__d").getItem(1).as("h"),
        col("n_bytes"))
      .groupBy("shape")
      .agg(count(lit(1)).as("n"), sum(col("area")).as("sum_area"),
        max(col("w")).as("max_w"), max(col("h")).as("max_h"),
        sum(col("n_bytes")).as("sum_bytes"))
      .orderBy("shape")
  }

  private val q198Oracle: String =
    """WITH p AS (SELECT p_partkey,
      |    p_partkey % 2000 + 16 AS w, (p_partkey * 7) % 2000 + 16 AS h,
      |    p_partkey % 23 <> 0 AS ok,
      |    43 + p_partkey % 32 AS n_bytes
      |  FROM part),
      |r AS (SELECT CASE WHEN NOT ok THEN 'INVALID'
      |      WHEN w > h THEN 'landscape' WHEN w < h THEN 'portrait'
      |      ELSE 'square' END AS shape,
      |    CASE WHEN ok THEN w * h ELSE 0 END AS area,
      |    CASE WHEN ok THEN w END AS w, CASE WHEN ok THEN h END AS h,
      |    n_bytes
      |  FROM p)
      |SELECT shape, count(*) AS n, CAST(sum(area) AS BIGINT) AS sum_area,
      |  max(w) AS max_w, max(h) AS max_h,
      |  CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q199: right-to-be-forgotten erasure audit ---------------------------------
  // The GDPR/CCPA deletion proof a data platform owes its counsel:
  // given a deletion list, purge every derived store (the raw docs,
  // the chunk store, the fingerprint store) via broadcast ANTI-join —
  // the deletion list is small by nature, so the purge is map-side
  // over each 100 TB store — and then PROVE the purge with a semi-join
  // leak census (asserted zero by re-scan, never assumed). One row
  // per store: before / after / leaks.
  private def q199(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .localCheckpoint(true) // feeds all three stores
    val del = docs.where(col("doc_id") % 17 === 0).select("doc_id")
    val chunks = TextOps.charChunks(docs, "doc_id", "text", 200, 150)
    val fps = docs.select(col("doc_id"),
      TextOps.fingerprint(col("text")).as("fp"))
    def audit(store: DataFrame, name: String): DataFrame = {
      // the purge is a MAP-SIDE broadcast anti-join — recomputing it
      // for the leak scan is two cheap passes over the checkpointed
      // store, and keeping it lazy leaves the join shape visible to
      // the plan guard (an eager checkpoint would hide it)
      val purged = store.join(broadcast(del), Seq("doc_id"), "left_anti")
      val leaks = purged.join(broadcast(del), Seq("doc_id"), "left_semi")
      store.agg(count(lit(1)).as("n_before"))
        .crossJoin(broadcast(purged.agg(count(lit(1)).as("n_after"))))
        .crossJoin(broadcast(leaks.agg(count(lit(1)).as("n_leaks"))))
        .select(lit(name).as("store"), col("n_before"), col("n_after"),
          col("n_leaks"))
    }
    audit(docs, "documents")
      .unionAll(audit(chunks, "chunks"))
      .unionAll(audit(fps, "fingerprints"))
      .orderBy("store")
  }

  private val q199Oracle: String =
    """WITH docs AS (SELECT doc_id, text FROM documents),
      |chunks AS (SELECT doc_id FROM (SELECT doc_id,
      |    unnest(range(0, (length(text) - 1) // 150 + 1)) AS i
      |  FROM docs WHERE length(text) > 0)),
      |counts AS (
      |  SELECT 'documents' AS store, count(*) AS n_before,
      |    count(*) FILTER (doc_id % 17 <> 0) AS n_after FROM docs
      |  UNION ALL
      |  SELECT 'chunks', count(*),
      |    count(*) FILTER (doc_id % 17 <> 0) FROM chunks
      |  UNION ALL
      |  SELECT 'fingerprints', count(*),
      |    count(*) FILTER (doc_id % 17 <> 0) FROM docs)
      |SELECT store, n_before, n_after, CAST(0 AS BIGINT) AS n_leaks
      |FROM counts ORDER BY store""".stripMargin

  // -- q200: training-data freeze manifest ---------------------------------------
  // The capstone composition: exact text dedup (min-id canonical) ->
  // quality floor at the corpus median -> deterministic 80/10/10
  // split -> the per-(split, source) manifest a training run records
  // before it starts: document count, token budget, and an
  // order-independent corpus digest (bit_xor of the doc fingerprints
  // — associative, commutative, overflow-free, so any executor
  // layout produces the identical digest and any single changed or
  // missing document flips it).
  private val FreezeSeed = 2024L

  private def q200(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
    // canonical rep per distinct text: min doc_id (one shuffle on text)
    val reps = docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .join(docs, Seq("doc_id", "text"))
      .select(col("doc_id"), col("text"), col("source"),
        Norm.n4(TextOps.qualityScore(col("text"))).as("q4"),
        TextOps.fingerprint(col("text")).as("fp"),
        TextOps.nTokens(col("text")).cast("long").as("nt"))
      .localCheckpoint(true) // cut pass AND manifest pass
    val cut = reps.agg(percentile(col("q4"), lit(0.5)).as("__cut"))
    val kept = reps.crossJoin(broadcast(cut))
      .where(col("q4") >= col("__cut"))
    MixOps.assignSplit(kept, "doc_id", FreezeSeed,
        Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
      .groupBy("split", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"),
        expr("bit_xor(fp)").as("digest"))
      .orderBy("split", "source")
  }

  private val q200Oracle: String = {
    val split = MixOps.assignSplitSql("doc_id", FreezeSeed,
      Seq(("train", 0.8), ("val", 0.1), ("test", 0.1)))
    s"""WITH reps AS (SELECT d.doc_id, d.text, d.source,
       |    ${graft.etl.OracleSql.n4(TextOps.qualityScoreSql("d.text"))} AS q4,
       |    ${TextOps.fingerprintSql("d.text")} AS fp,
       |    ${TextOps.nTokensSql("d.text")} AS nt
       |  FROM (SELECT text, min(doc_id) AS doc_id FROM documents
       |        GROUP BY text) r
       |  JOIN documents d ON r.doc_id = d.doc_id AND r.text = d.text),
       |c AS (SELECT quantile_cont(q4, 0.5) AS cut FROM reps),
       |kept AS (SELECT *, $split AS split FROM reps CROSS JOIN c
       |  WHERE q4 >= cut)
       |SELECT split, source, count(*) AS n_docs,
       |  CAST(sum(nt) AS BIGINT) AS n_tokens,
       |  bit_xor(fp) AS digest
       |FROM kept GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q198_jpeg_metadata", q198, Some(q198Oracle)),
    QueryDef("q199_erasure_audit", q199, Some(q199Oracle)),
    QueryDef("q200_freeze_manifest", q200, Some(q200Oracle)))
}
