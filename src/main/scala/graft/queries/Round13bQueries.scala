package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.ops.{DedupOps, TextOps}

/** Round-13 second wave: Krippendorff's alpha inter-rater agreement
  * (q313 — the multi-rater, missing-data statistic kappa can't do),
  * a Heaps'-law vocabulary-growth fit (q314 — the tokenizer-sizing
  * companion to q168's Zipf fit), and duplicated-span token coverage
  * (q315 — what fraction of each source's tokens sits inside a
  * repeated k-gram span, the corpus-health headline the q138 span
  * detector feeds).
  */
object Round13bQueries {

  private def gridU(c: org.apache.spark.sql.Column) =
    floor(c * lit(1000000.0) + lit(0.5)).cast(LongType)

  // -- q313: Krippendorff's alpha ----------------------------------------------
  // Inter-rater agreement with MISSING cells — the statistic that
  // replaces Cohen's kappa (q267 family) when raters are many and
  // incomplete, which is exactly the multi-judge labeling matrix an
  // LLM-judge ensemble produces. Units = users, raters = event
  // types, rating = the binary "mean value ≥ 50" verdict (exact via
  // integer cents, never a float mean). Nominal-distance alpha over
  // binary ratings: per pairable unit (m ≥ 2 ratings)
  //   do_u = 2·n1·n0 / (m−1)    (Σ_v n_v(m−n_v) for two values)
  // landed on the ppb grid per unit (trunc-div, < 1 ppb bias each,
  // same grid both engines), integer-summed; the expected
  // disagreement uses the pooled margins De = 2·N1·N0 and
  //   alpha_ppb = 1e9 − (N−1)·ΣDo_ppb div De
  // with every product in DECIMAL(38)/HUGEINT. One tiny
  // (unit, rater) census is the only data-sized shuffle.
  private def q313(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val ratings = Tables.read(spark, sfDir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast(LongType)).as("sum_c"),
        count(lit(1)).as("cnt"))
      .select(col("user_id"),
        when(col("sum_c") >= lit(5000L) * col("cnt"), 1L).otherwise(0L)
          .as("v"))
    val units = ratings.groupBy("user_id")
      .agg(count(lit(1)).as("m"), sum(col("v")).as("n1"))
      .where(col("m") >= 2)
    units
      .select(col("m"), col("n1"), (col("m") - col("n1")).as("n0"))
      .select(col("m"), col("n1"), col("n0"),
        expr("CAST((CAST(n1 AS DECIMAL(38,0)) * n0 * 2 * 1000000000)" +
          " div (m - 1) AS DECIMAL(38,0))").as("do_ppb"))
      .agg(count(lit(1)).as("n_units"), sum(col("m")).as("n_ratings"),
        sum(col("n1")).as("nn1"), sum(col("do_ppb")).as("do_sum"))
      .select(col("n_units"), col("n_ratings"),
        // De = 2·N1·N0; NULL (no error, no verdict) when De = 0 —
        // every rating identical means chance disagreement is 0/0
        expr("CASE WHEN nn1 > 0 AND nn1 < n_ratings THEN CAST(" +
          "1000000000 - (CAST(n_ratings - 1 AS DECIMAL(38,0)) * do_sum)" +
          " div (CAST(nn1 AS DECIMAL(38,0)) * (n_ratings - nn1) * 2)" +
          " AS BIGINT) END").as("alpha_ppb"))
  }

  private val q313Oracle: String =
    """WITH r AS (SELECT user_id,
      |    CASE WHEN sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
      |      >= 5000 * count(*) THEN 1 ELSE 0 END AS v
      |  FROM events GROUP BY user_id, event_type),
      |u AS (SELECT user_id, count(*) AS m,
      |    CAST(sum(v) AS BIGINT) AS n1 FROM r GROUP BY 1
      |  HAVING count(*) >= 2),
      |t AS (SELECT count(*) AS n_units,
      |    CAST(sum(m) AS BIGINT) AS n_ratings,
      |    CAST(sum(n1) AS BIGINT) AS nn1,
      |    sum(CAST(n1 AS HUGEINT) * (m - n1) * 2 * 1000000000 // (m - 1))
      |      AS do_sum
      |  FROM u)
      |SELECT n_units, n_ratings,
      |  CASE WHEN nn1 > 0 AND nn1 < n_ratings THEN CAST(
      |    1000000000 - (CAST(n_ratings - 1 AS HUGEINT) * do_sum)
      |    // (CAST(nn1 AS HUGEINT) * (n_ratings - nn1) * 2)
      |    AS BIGINT) END AS alpha_ppb
      |FROM t""".stripMargin

  // -- q314: Heaps'-law vocabulary growth fit -----------------------------------
  // V(N) ≈ K·N^β — how fast the vocabulary grows with corpus size,
  // the tokenizer-budget companion to q168's Zipf fit. The corpus is
  // cut into 20 doc-id buckets; per bucket, token mass comes from one
  // census and NEW vocabulary from the first-seen (min doc id) census
  // over 8-byte token hashes (collision merging shared bit-exactly
  // with the oracle — the q110 argument). Cumulative sums ride a
  // window over the ≤20-row bucket frame (config-bounded, never
  // data-bounded); ln lands on the 1e-6 grid and the OLS moments are
  // exact DECIMAL/HUGEINT sums (the q168 idiom).
  private val HeapsBuckets = 20

  private def q314(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val docs = Tables.read(spark, sfDir, "documents")
    val bs = docs.agg(
      expr(s"(max(doc_id) + $HeapsBuckets) div $HeapsBuckets").as("bs"))
    val toks = docs.crossJoin(broadcast(bs))
      .select(expr("doc_id div bs").as("b"), col("doc_id"),
        TextOps.tokens(col("text")).as("__toks"))
      .localCheckpoint(true) // feeds the mass census AND first-seen
    val mass = toks.groupBy("b")
      .agg(sum(size(col("__toks")).cast(LongType)).as("nt"))
    val firstSeen = toks
      .select(col("doc_id"), explode(col("__toks")).as("w"))
      .groupBy(TextOps.tokenHash(col("w")).as("h"))
      .agg(min(col("doc_id")).as("fd"))
      .crossJoin(broadcast(bs))
      .groupBy(expr("fd div bs").as("b"))
      .agg(count(lit(1)).as("nv"))
    val w = Window.orderBy("b")
      .rowsBetween(Window.unboundedPreceding, 0)
    val curve = mass.join(firstSeen, Seq("b"), "left")
      .na.fill(0L, Seq("nv"))
      .select(col("b"), sum(col("nt")).over(w).as("cum_n"),
        sum(col("nv")).over(w).as("cum_v"))
      .select(gridU(log(col("cum_n").cast("double"))).as("x_u"),
        gridU(log(col("cum_v").cast("double"))).as("y_u"))
    curve.agg(count(lit(1)).as("k"),
        sum(col("x_u")).as("sx"), sum(col("y_u")).as("sy"),
        sum(col("x_u").cast(dec) * col("y_u").cast(dec)).as("sxy"),
        sum(col("x_u").cast(dec) * col("x_u").cast(dec)).as("sxx"))
      .select(col("k").as("n_points"),
        Norm.n4((col("k").cast(dec) * col("sxy") -
            col("sx").cast(dec) * col("sy").cast(dec)).cast("double") /
          (col("k").cast(dec) * col("sxx") -
            col("sx").cast(dec) * col("sx").cast(dec)).cast("double"))
          .as("beta_n4"))
  }

  private val q314Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH bsz AS (SELECT (max(doc_id) + $HeapsBuckets) // $HeapsBuckets
       |    AS bs FROM documents),
       |toks AS (SELECT doc_id, ${TextOps.tokensSql("text")} AS t
       |  FROM documents),
       |mass AS (SELECT doc_id // bs AS b, CAST(sum(len(t)) AS BIGINT) AS nt
       |  FROM toks, bsz GROUP BY 1),
       |fs AS (SELECT ${TextOps.tokenHashSql("w")} AS h, min(doc_id) AS fd
       |  FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1),
       |nv AS (SELECT fd // bs AS b, count(*) AS nv FROM fs, bsz GROUP BY 1),
       |curve AS (SELECT
       |    CAST(floor(ln(CAST(sum(nt) OVER (ORDER BY mass.b
       |        ROWS UNBOUNDED PRECEDING) AS DOUBLE)) * 1000000.0 + 0.5)
       |      AS BIGINT) AS x_u,
       |    CAST(floor(ln(CAST(sum(coalesce(nv.nv, 0)) OVER (ORDER BY mass.b
       |        ROWS UNBOUNDED PRECEDING) AS DOUBLE)) * 1000000.0 + 0.5)
       |      AS BIGINT) AS y_u
       |  FROM mass LEFT JOIN nv ON mass.b = nv.b),
       |m AS (SELECT CAST(count(*) AS HUGEINT) AS k,
       |    CAST(sum(x_u) AS HUGEINT) AS sx, CAST(sum(y_u) AS HUGEINT) AS sy,
       |    sum(CAST(x_u AS HUGEINT) * y_u) AS sxy,
       |    sum(CAST(x_u AS HUGEINT) * x_u) AS sxx
       |  FROM curve)
       |SELECT CAST(k AS BIGINT) AS n_points,
       |  ${n4("CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE)")}
       |    AS beta_n4
       |FROM m""".stripMargin
  }

  // -- q315: duplicated-span token coverage --------------------------------------
  // The corpus-health headline over q138's Lee-et-al span detector:
  // what fraction of each source's tokens lies inside SOME repeated
  // k-gram span? Within one document the detector's islands are
  // disjoint and gap-merged (starts ≤ k apart coalesce), so the sum
  // of span_tokens IS the exact union coverage — no position-set
  // materialization. Coverage is one ppm trunc-div of exact counts.
  private val CovK = 3
  private val CovMinRepeats = 2L

  private def q315(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.read(spark, sfDir, "documents")
    val perDoc = DedupOps.repeatedKgramSpans(
        docs.select(col("doc_id"), col("text")),
        "doc_id", "text", CovK, CovMinRepeats)
      .groupBy("doc_id").agg(sum(col("span_tokens")).as("covered"))
    docs.select(col("doc_id"), col("source"),
        TextOps.nTokens(col("text")).cast(LongType).as("nt"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("covered"))
      .groupBy("source")
      .agg(sum(col("nt")).as("total_tokens"),
        sum(col("covered")).as("covered_tokens"))
      .select(col("source"), col("total_tokens"), col("covered_tokens"),
        expr("covered_tokens * 1000000 div total_tokens")
          .as("coverage_ppm"))
      .orderBy("source")
  }

  private val q315Oracle: String = {
    val spans = DedupOps.repeatedKgramSpansSql(
      "documents", "doc_id", "text", CovK, CovMinRepeats)
    s"""SELECT source, CAST(sum(nt) AS BIGINT) AS total_tokens,
       |  CAST(sum(covered) AS BIGINT) AS covered_tokens,
       |  CAST(CAST(sum(covered) AS HUGEINT) * 1000000
       |    // CAST(sum(nt) AS HUGEINT) AS BIGINT) AS coverage_ppm
       |FROM (
       |  SELECT d.source, ${TextOps.nTokensSql("d.text")} AS nt,
       |    coalesce(p.covered, 0) AS covered
       |  FROM documents d LEFT JOIN (
       |    SELECT doc_id, sum(span_tokens) AS covered FROM (
       |$spans
       |    ) GROUP BY 1) p ON d.doc_id = p.doc_id)
       |GROUP BY 1 ORDER BY source""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q313_krippendorff_alpha", q313, Some(q313Oracle)),
    QueryDef("q314_heaps_fit", q314, Some(q314Oracle)),
    QueryDef("q315_dup_span_coverage", q315, Some(q315Oracle)),
  )
}
