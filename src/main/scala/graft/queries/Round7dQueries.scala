package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._

/** Round-7 fifth wave: corpus composition analytics (trigram novelty,
  * vocabulary coverage, source vocabulary overlap), exact ROC AUC for
  * curation-signal evaluation, and per-user Markov transitions. Each
  * beyond the reference surface with a full DuckDB oracle; every
  * ratio is one division of exact integers (see CorpusOps / EvalOps
  * scaladoc), so no float normalization appears in this wave either.
  */
object Round7dQueries {

  // -- q110: trigram novelty ------------------------------------------------
  private def q110(spark: SparkSession, sfDir: String): DataFrame =
    CorpusOps.trigramNovelty(
      Tables.read(spark, sfDir, "documents"), "doc_id", "text")

  private val q110Oracle: String =
    CorpusOps.trigramNoveltySql("documents", "doc_id", "text")

  // -- q111: vocabulary coverage curve -------------------------------------
  private val VocabK = 100

  private def q111(spark: SparkSession, sfDir: String): DataFrame =
    CorpusOps.vocabCoverage(
      Tables.read(spark, sfDir, "documents"), "text", VocabK)

  private val q111Oracle: String =
    CorpusOps.vocabCoverageSql("documents", "text", VocabK)

  // -- q112: ROC AUC of a curation signal ----------------------------------
  // Does raw document length separate English from non-English docs?
  // (The answer doesn't matter; the exact rank-sum machinery does.)
  private def q112(spark: SparkSession, sfDir: String): DataFrame =
    EvalOps.aucRankSum(Tables.read(spark, sfDir, "documents"),
      col("lang") === "en", col("n_chars"))

  private val q112Oracle: String =
    EvalOps.aucRankSumSql("documents", "lang = 'en'", "n_chars")

  // -- q113: Markov transition matrix --------------------------------------
  private def q113(spark: SparkSession, sfDir: String): DataFrame =
    EventOps.transitionMatrix(Tables.read(spark, sfDir, "events"))

  private val q113Oracle: String = EventOps.transitionMatrixSql()

  // -- q114: source vocabulary overlap -------------------------------------
  private def q114(spark: SparkSession, sfDir: String): DataFrame =
    CorpusOps.sourceOverlap(
      Tables.read(spark, sfDir, "documents"), "source", "text")

  private val q114Oracle: String =
    CorpusOps.sourceOverlapSql("documents", "source", "text")

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q110_trigram_novelty", q110, Some(q110Oracle)),
    QueryDef("q111_vocab_coverage", q111, Some(q111Oracle)),
    QueryDef("q112_auc_score", q112, Some(q112Oracle)),
    QueryDef("q113_markov_transitions", q113, Some(q113Oracle)),
    QueryDef("q114_source_overlap", q114, Some(q114Oracle)),
  )
}
