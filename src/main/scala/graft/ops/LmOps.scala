package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Cheap-language-model corpus scoring beyond [[TextOps.unigramLogprob]]:
  * bigram-context surprisal (the next step up the n-gram ladder the
  * perplexity filters actually climb) and DSIR-style importance
  * weights (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling" — rank raw docs by how target-like their
  * token distribution is).
  *
  * Both fold per-token log terms on the q81 integer micro-grid
  * (⌊t·10⁶+0.5⌋ summed as BIGINT), so doc scores are associative
  * integer sums — bit-identical on any partition layout and engine.
  */
object LmOps {

  private def gridU(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * lit(1000000.0) + lit(0.5)).cast(LongType)

  // ---- bigram surprisal --------------------------------------------------

  /** Per-doc mean bigram surprisal under the corpus's own add-one
    * bigram model: for each adjacent pair (w₁,w₂),
    * `s = −ln((c(w₁,w₂)+1) / (c(w₁)+V))`, summed per doc on the
    * micro-grid. Returns (idCol, n_big, surp_u); docs with < 2
    * tokens have no bigrams and drop out (same on both engines).
    *
    * Scale shape: one bigram-keyed count shuffle + one token-keyed
    * count shuffle (both partial-aggregable), then scoring joins that
    * reuse those partitionings, then one doc-keyed fold. V rides in
    * as a 1-row cross join — nothing driver-side, nothing broadcasts
    * the (unbounded) vocabulary.
    */
  def bigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol), TextOps.tokens(col(textCol)).as("__toks"))
    val big = toks.select(col(idCol),
      explode(TextOps.ngramsOf(col("__toks"), 2)).as("bg"))
    val uni = toks.select(explode(col("__toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).cast(DoubleType).as("v"))
    val bcnt = big.groupBy("bg").agg(count(lit(1)).as("cb"))
    val surp = gridU(-log(
      (col("cb").cast(DoubleType) + lit(1.0)) /
        (col("cu").cast(DoubleType) + col("v"))))
    big.join(bcnt, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_big"), sum(surp).as("surp_u"))
  }

  /** [[bigramSurprisal]] oracle rendering. */
  def bigramSurprisalSql(table: String, idCol: String, textCol: String): String = {
    val surp =
      "-ln((CAST(cb AS DOUBLE) + 1.0) / (CAST(cu AS DOUBLE) + v))"
    s"""WITH toks AS (SELECT $idCol, ${TextOps.tokensSql(textCol)} AS tk FROM $table),
       |big AS (SELECT $idCol, unnest(${TextOps.ngramsSql(textCol, 2)}) AS bg FROM $table),
       |uni AS (SELECT w1, count(*) AS cu
       |        FROM (SELECT unnest(tk) AS w1 FROM toks) GROUP BY 1),
       |vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
       |bcnt AS (SELECT bg, count(*) AS cb FROM big GROUP BY 1)
       |SELECT $idCol, count(*) AS n_big,
       |  CAST(sum(CAST(floor(($surp) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS surp_u
       |FROM big JOIN bcnt USING (bg)
       |JOIN uni ON split_part(bg, ' ', 1) = w1
       |CROSS JOIN vocab
       |GROUP BY $idCol""".stripMargin
  }

  // ---- DSIR importance weights -------------------------------------------

  /** DSIR importance weight of every doc against a target slice of
    * the same corpus: `w(d) = Σ_tokens ln(p̂_tgt(t) / p̂_raw(t))`
    * with add-one smoothing (`p̂(t) = (c(t)+1)/(N+V)`), micro-grid
    * folded. High w = token distribution close to the target slice —
    * the resampling key for target-domain selection. Returns
    * (idCol, n_tok, w_u).
    *
    * Scale shape: ONE token-keyed shuffle computes raw and target
    * counts together (the target count is a filtered aggregate of
    * the same groups); corpus totals ride in as a 1-row cross join;
    * the scoring join reuses the token partitioning and one doc fold
    * finishes. Two scans of the token stream total.
    */
  def dsirWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: org.apache.spark.sql.Column): DataFrame = {
    val toks = df.select(col(idCol), targetPred.as("__tgt"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok").agg(
      count(lit(1)).as("cs"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("ct"))
    val tot = counts.agg(
      (sum(col("cs")) + count(lit(1))).cast(DoubleType).as("ds"),
      (sum(col("ct")) + count(lit(1))).cast(DoubleType).as("dt"))
    val term = gridU(
      log((col("ct").cast(DoubleType) + lit(1.0)) / col("dt")) -
        log((col("cs").cast(DoubleType) + lit(1.0)) / col("ds")))
    toks.join(counts, "tok")
      .crossJoin(broadcast(tot))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum(term).as("w_u"))
  }

  /** [[dsirWeights]] oracle rendering; `targetPredSql` is the slice
    * predicate over the source table's columns.
    */
  def dsirWeightsSql(table: String, idCol: String, textCol: String,
      targetPredSql: String): String = {
    val term =
      """ln((CAST(ct AS DOUBLE) + 1.0) / dt) - ln((CAST(cs AS DOUBLE) + 1.0) / ds)"""
    s"""WITH toks AS (SELECT $idCol, ($targetPredSql) AS tgt,
       |    unnest(${TextOps.tokensSql(textCol)}) AS tok FROM $table),
       |counts AS (SELECT tok, count(*) AS cs,
       |    CAST(sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct
       |  FROM toks GROUP BY 1),
       |tot AS (SELECT CAST(sum(cs) + count(*) AS DOUBLE) AS ds,
       |    CAST(sum(ct) + count(*) AS DOUBLE) AS dt FROM counts)
       |SELECT $idCol, count(*) AS n_tok,
       |  CAST(sum(CAST(floor(($term) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS w_u
       |FROM toks JOIN counts USING (tok) CROSS JOIN tot
       |GROUP BY $idCol""".stripMargin
  }
}
