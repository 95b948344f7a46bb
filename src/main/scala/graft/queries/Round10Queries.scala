package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, MixOps, MultimodalOps, SimilarityOps, StatsOps}

/** Round-10 additions: substring-granular dedup, token-budget mix
  * allocation, PCA power iteration.
  */
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

  // -- q139: token-budget mix allocation -------------------------------------
  // The pretraining sampling table: a 2.0-epoch global budget split by
  // sqrt-flattened source weights under a 2.05-epoch per-source cap.
  // The fixture's sources are near-uniform (±15% tokens), so sqrt
  // flattening pushes the below-average sources PAST the 2.05 cap —
  // both the cap branch and the leftover-redistribution branch are
  // exercised, not just the proportional path. Pure BIGINT after the
  // sqrt; micro-epoch output.
  private val BudgetPerMille = 2000L
  private val EpochCapPct = 205L

  private def q139(spark: SparkSession, sfDir: String): DataFrame =
    MixOps.tokenBudget(Tables.read(spark, sfDir, "documents"),
      "source", "text", BudgetPerMille, EpochCapPct)

  private val q139Oracle: String =
    MixOps.tokenBudgetSql("documents", "source", "text",
      BudgetPerMille, EpochCapPct)

  // -- q140: top principal component (power iteration) -----------------------
  // Embedding-cloud PCA without materializing the covariance: three
  // matrix-free power iterations over the 64-dim embeddings, every
  // stat n4-gridded (the q76 discipline) so DuckDB replays the exact
  // trajectory from the same uniform init.
  private val PcaDims = 64
  private val PcaIters = 3

  private def q140(spark: SparkSession, sfDir: String): DataFrame =
    SimilarityOps.pcaTopComponent(
      Tables.read(spark, sfDir, "embeddings"), PcaDims, PcaIters)

  private val q140Oracle: String =
    SimilarityOps.pcaTopComponentSql("embeddings", PcaDims, PcaIters)

  // -- q141: PSI distribution drift ------------------------------------------
  // The binned drift audit (KS q122's industry sibling): order totals,
  // 1995 as reference vs 1996 as current (the fixture spans 1995-2001),
  // 10 pooled-range bins with
  // the ≥1-count clamp and dense bin spine. TPC-H years are iid by
  // construction, so the audit reads near-zero PSI — the calibrated
  // no-drift baseline a monitor alarms against.
  private val PsiBins = 10

  private def q141(spark: SparkSession, sfDir: String): DataFrame = {
    val yr = year(to_date(col("o_orderdate")))
    StatsOps.psiDrift(Tables.read(spark, sfDir, "orders"),
      col("o_totalprice"), yr === 1995, yr === 1996, PsiBins)
  }

  private val q141Oracle: String =
    StatsOps.psiDriftSql("orders", "o_totalprice",
      "year(CAST(o_orderdate AS DATE)) = 1995",
      "year(CAST(o_orderdate AS DATE)) = 1996", PsiBins)

  // -- q142: l-diversity audit -----------------------------------------------
  // q131's k-anonymity counts group SIZES; l-diversity audits what k
  // can't see — a group can be large yet expose everyone if the
  // SENSITIVE attribute (source here) is uniform within it. Flag each
  // (lang, length-bucket) quasi-identifier group whose distinct
  // sensitive count is below L. One partial-aggregable
  // count-distinct over the quasi-identifier domain.
  private val DivL = 3

  private def q142(spark: SparkSession, sfDir: String): DataFrame =
    Tables.read(spark, sfDir, "documents")
      .groupBy(col("lang"), expr("n_chars div 100").as("len_bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("source")).as("n_sensitive"))
      .where(col("n_sensitive") < DivL)
      .orderBy("lang", "len_bucket")

  private val q142Oracle: String =
    s"""SELECT lang, n_chars // 100 AS len_bucket, count(*) AS n,
       |  CAST(count(DISTINCT source) AS BIGINT) AS n_sensitive
       |FROM documents GROUP BY 1, 2
       |HAVING count(DISTINCT source) < $DivL
       |ORDER BY 1, 2""".stripMargin

  // -- q143: PNG header metadata roundtrip -----------------------------------
  // Real container-format parsing, no codec required: each doc gets a
  // spec-correct PNG signature+IHDR payload (width/height derived
  // deterministically from doc data; every 7th doc gets a corrupted
  // signature), and an INDEPENDENT offset-by-offset parser reads the
  // dimensions back, returning NULLs for the corrupted payloads. The
  // oracle computes the expected dims algebraically from the same doc
  // data — so a wrong offset, wrong endianness, or a crash on the
  // corrupt path breaks the gate. The payload column is real `binary`
  // (the multimodal column convention of q25), and the parse is a
  // pure projection — the metadata pass a media pipeline runs before
  // ever shipping bytes to a decoder.
  private def q143(spark: SparkSession, sfDir: String): DataFrame = {
    val d = Tables.read(spark, sfDir, "documents")
    val payload = MultimodalOps.pngHeader(
      col("n_chars") % 640 + 1, col("doc_id") % 480 + 1,
      col("doc_id") % 7 =!= 0)
    val dims = MultimodalOps.pngDims(col("payload"))
    d.select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"), dims.as("__d"),
        octet_length(col("payload")).cast("long").as("n_bytes"))
      .select(col("doc_id"),
        col("__d").getItem(0).as("width"),
        col("__d").getItem(1).as("height"),
        col("__d").getItem(2).as("bit_depth"),
        col("__d").getItem(3).as("color_type"),
        col("n_bytes"))
      .orderBy("doc_id")
  }

  private val q143Oracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 <> 0 THEN n_chars % 640 + 1 END AS width,
      |  CASE WHEN doc_id % 7 <> 0 THEN doc_id % 480 + 1 END AS height,
      |  CASE WHEN doc_id % 7 <> 0 THEN CAST(8 AS BIGINT) END AS bit_depth,
      |  CASE WHEN doc_id % 7 <> 0 THEN CAST(6 AS BIGINT) END AS color_type,
      |  CAST(26 AS BIGINT) AS n_bytes
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q144: embedding drift monitor (PCA projection -> PSI) -----------------
  // The composed monitor a feature store runs on its vector column:
  // project every embedding onto the corpus's top principal component
  // (q140's trajectory), then PSI the projection distribution between
  // two deterministic halves (even vs odd vec_id — iid by
  // construction, so the calibrated no-drift baseline). Composition
  // is the point: the projection is one kernel dot against the
  // collected component literals (map-side), and the drift audit
  // reuses q141's dense-bin machinery over the n4-gridded scores.
  private val DriftBins = 8

  private def q144(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
    val v = SimilarityOps.pcaComponentVector(emb, PcaDims, PcaIters)
    val proj = emb.select(col("vec_id"),
      Norm.n4(SimilarityOps.dot(
        SimilarityOps.asDouble(col("embedding")), typedLit(v.toSeq))).as("s"))
    StatsOps.psiDrift(proj, col("s"),
      col("vec_id") % 2 === 0, col("vec_id") % 2 === 1, DriftBins)
  }

  private val q144Oracle: String = {
    val dims = PcaDims
    val projDot = "CAST(list_sum(list_transform(range(1, " + (dims + 1) +
      "), __i -> (pv)[__i] * (vl)[__i])) AS DOUBLE)"
    val extra = SimilarityOps.pcaCtes("embeddings", PcaDims, PcaIters) +
      s""",
         |__pb AS (SELECT vec_id, list_transform(embedding,
         |    __x -> CAST(__x AS DOUBLE)) AS pv FROM embeddings),
         |__proj AS (SELECT vec_id,
         |    ${graft.etl.OracleSql.n4(projDot)} AS s
         |  FROM __pb, __vl$PcaIters)""".stripMargin
    StatsOps.psiDriftSql("__proj", "s",
      "vec_id % 2 = 0", "vec_id % 2 = 1", DriftBins, extraCtes = extra)
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q138_substring_dedup", q138, Some(q138Oracle)),
    QueryDef("q139_token_budget", q139, Some(q139Oracle)),
    QueryDef("q140_pca_power", q140, Some(q140Oracle)),
    QueryDef("q141_psi_drift", q141, Some(q141Oracle)),
    QueryDef("q142_l_diversity", q142, Some(q142Oracle)),
    QueryDef("q143_png_metadata", q143, Some(q143Oracle)),
    QueryDef("q144_embedding_drift", q144, Some(q144Oracle)))
}
