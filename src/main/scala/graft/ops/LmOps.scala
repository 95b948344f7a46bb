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

  /** [[bigramSurprisal]] with a TRAIN/EVAL split: the add-one bigram
    * model is fit ONLY on `trainPred` rows and scores ONLY the
    * held-out rows — the leakage-free perplexity eval (a model scored
    * on its own training corpus reads optimistically low surprisal;
    * q106 measures corpus self-statistics, this measures
    * generalization). Unseen eval bigrams/unigrams hit the add-one
    * floor via left joins (`c = 0`), exactly as at inference time.
    *
    * Same scale shape as [[bigramSurprisal]] — the split predicate
    * rides the token stream; no extra pass.
    */
  def bigramSurprisalHeldout(df: DataFrame, idCol: String, textCol: String,
      trainPred: org.apache.spark.sql.Column): DataFrame = {
    val toks = df.select(col(idCol), trainPred.as("__tr"),
      TextOps.tokens(col(textCol)).as("__toks"))
    val train = toks.where(col("__tr"))
    val uni = train.select(explode(col("__toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cu"))
    val vocab = uni.agg(count(lit(1)).cast(DoubleType).as("v"))
    val bcnt = train.select(explode(TextOps.ngramsOf(col("__toks"), 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cb"))
    val evalBig = toks.where(!col("__tr")).select(col(idCol),
      explode(TextOps.ngramsOf(col("__toks"), 2)).as("bg"))
    val surp = gridU(-log(
      (coalesce(col("cb"), lit(0L)).cast(DoubleType) + lit(1.0)) /
        (coalesce(col("cu"), lit(0L)).cast(DoubleType) + col("v"))))
    evalBig.join(bcnt, Seq("bg"), "left")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(uni, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_big"), sum(surp).as("surp_u"))
  }

  /** [[bigramSurprisalHeldout]] oracle rendering; `trainPredSql` is
    * the split predicate over the source table's columns.
    */
  def bigramSurprisalHeldoutSql(table: String, idCol: String, textCol: String,
      trainPredSql: String): String = {
    val surp =
      "-ln((CAST(coalesce(cb, 0) AS DOUBLE) + 1.0) / (CAST(coalesce(cu, 0) AS DOUBLE) + v))"
    s"""WITH base AS (SELECT $idCol, ($trainPredSql) AS tr,
       |    ${TextOps.tokensSql(textCol)} AS tk,
       |    ${TextOps.ngramsSql(textCol, 2)} AS bgs
       |  FROM $table),
       |uni AS (SELECT w1, count(*) AS cu FROM (
       |    SELECT unnest(tk) AS w1 FROM base WHERE tr) GROUP BY 1),
       |vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
       |bcnt AS (SELECT bg, count(*) AS cb FROM (
       |    SELECT unnest(bgs) AS bg FROM base WHERE tr) GROUP BY 1),
       |ebig AS (SELECT $idCol, unnest(bgs) AS bg FROM base WHERE NOT tr)
       |SELECT $idCol, count(*) AS n_big,
       |  CAST(sum(CAST(floor(($surp) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS surp_u
       |FROM ebig LEFT JOIN bcnt USING (bg)
       |LEFT JOIN uni ON split_part(bg, ' ', 1) = w1
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
  // ---- BPE merge learning ------------------------------------------------

  /** Learn the first `iters` BPE merges from the corpus (Sennrich et
    * al. 2016, "Neural Machine Translation of Rare Words with Subword
    * Units" — the algorithm behind every production subword
    * tokenizer): start from characters, repeatedly merge the
    * most-frequent adjacent symbol pair (frequency-weighted by word
    * counts; ties broken lexicographically). Returns one row per
    * merge: (step, l_sym, r_sym, merged, freq).
    *
    * Words travel as a SPACE-FORM string — symbols joined by two
    * spaces with single-space sentinels (`" a  ab  a "`), so a merge
    * step is ONE `replace(rep, " l  r ", " lr ")` projection: each
    * symbol keeps a private flanking space on both sides, which makes
    * left-to-right non-overlapping `replace` semantics (identical in
    * the JVM and DuckDB — verified on the `" a  a  a "` overlap case)
    * coincide exactly with the BPE reference merge order, with no
    * false sub-symbol matches. No per-row loops, no UDFs.
    *
    * Scale shape: the word-frequency frame (vocab-sized, not
    * corpus-sized — the standard BPE-training reduction) is
    * checkpointed once; each iteration is one partial-aggregable
    * pair-census aggregate plus a ONE-ROW argmax collected as the
    * next merge literal (the sanctioned stats-literal pattern, ~40
    * bytes per iteration of driver state). At 100 TB the corpus scan
    * happens exactly once, in the word count.
    */
  def bpeMerges(docs: DataFrame, textCol: String, iters: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeCore(docs, textCol, iters)._1
      .toDF("step", "l_sym", "r_sym", "merged", "freq")
      .orderBy("step")
  }

  /** Vocabulary census AFTER applying [[bpeMerges]]'s learned merges:
    * the top-`topK` subword tokens by frequency-weighted occurrence —
    * the encode side of BPE (what the trained tokenizer actually
    * emits), sharing the merge loop with the trainer. Ties break
    * lexicographically.
    */
  def bpeVocab(docs: DataFrame, textCol: String, iters: Int,
      topK: Int): DataFrame = {
    val finalReps = bpeCore(docs, textCol, iters)._2
    finalReps
      .select(explode(split(trim(col("rep")), "  ")).as("token"), col("freq"))
      .groupBy("token").agg(sum(col("freq")).as("n"))
      .orderBy(col("n").desc, col("token")).limit(topK)
  }

  private def bpeCore(docs: DataFrame, textCol: String, iters: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    val words = docs
      .select(explode(TextOps.tokens(lower(col(textCol)))).as("w"))
      .where(col("w").rlike("^[a-z]{2,20}$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(concat(lit(" "),
          rtrim(regexp_replace(col("w"), "(.)", "$1  ")), lit(" ")).as("rep"),
        col("freq"))
      .localCheckpoint(true)
    var cur = words
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    for (step <- 1 to iters) {
      val s = split(trim(col("rep")), "  ")
      val top = cur
        .select(col("freq"), explode(arrays_zip(
          slice(s, lit(1), size(s) - 1).as("ls"),
          slice(s, lit(2), size(s) - 1).as("rs"))).as("p"))
        .select(col("p.ls").as("l_sym"), col("p.rs").as("r_sym"), col("freq"))
        .groupBy("l_sym", "r_sym").agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("l_sym"), col("r_sym")).limit(1)
        .collect()
      require(top.nonEmpty, s"corpus exhausted before merge $step")
      val l = top.head.getString(0)
      val r = top.head.getString(1)
      val f = top.head.getLong(2)
      merges += ((step, l, r, l + r, f))
      // symbols are ^[a-z]+$ by construction, so literal injection is safe
      cur = cur.select(replace(col("rep"), lit(s" $l  $r "), lit(s" $l$r "))
        .as("rep"), col("freq"))
    }
    (merges.result(), cur)
  }

  /** [[bpeMerges]] oracle rendering: `iters` unrolled
    * census→argmax→replace CTE blocks (the pair zip via DuckDB's
    * positional parallel unnest of the two shifted list slices).
    */
  def bpeMergesSql(table: String, textCol: String, iters: Int): String = {
    val out = (1 to iters).map(i =>
      s"SELECT $i AS step, l_sym, r_sym, l_sym || r_sym AS merged, f AS freq FROM m$i")
      .mkString("\n  UNION ALL ")
    s"""WITH ${bpeChainSql(table, textCol, iters)}
       |SELECT step, l_sym, r_sym, merged, freq FROM (
       |  $out)
       |ORDER BY step""".stripMargin
  }

  /** [[bpeVocab]] oracle rendering: the same chain, read out as the
    * post-merge token census.
    */
  def bpeVocabSql(table: String, textCol: String, iters: Int,
      topK: Int): String =
    s"""WITH ${bpeChainSql(table, textCol, iters)}
       |SELECT token, CAST(sum(freq) AS BIGINT) AS n
       |FROM (SELECT unnest(string_split(trim(rep), '  ')) AS token, freq
       |      FROM w$iters)
       |GROUP BY token ORDER BY n DESC, token LIMIT $topK""".stripMargin

  private def bpeChainSql(table: String, textCol: String, iters: Int): String = {
    val blocks = (1 to iters).map { i =>
      s"""p$i AS (SELECT unnest(l[1:len(l)-1]) AS l_sym,
         |    unnest(l[2:len(l)]) AS r_sym, freq
         |  FROM (SELECT string_split(trim(rep), '  ') AS l, freq FROM w${i - 1})),
         |m$i AS (SELECT l_sym, r_sym, CAST(sum(freq) AS BIGINT) AS f
         |  FROM p$i GROUP BY 1, 2 ORDER BY f DESC, l_sym, r_sym LIMIT 1),
         |w$i AS (SELECT replace(rep, ' ' || l_sym || '  ' || r_sym || ' ',
         |    ' ' || l_sym || r_sym || ' ') AS rep, freq
         |  FROM w${i - 1} CROSS JOIN m$i)""".stripMargin
    }.mkString(",\n")
    // the continuation concat lives mid-line: a line-LEADING `||`
    // would be re-eaten as a margin when this chain is embedded in a
    // caller's stripMargin template (the documented re-strip trap)
    s"""w0 AS (SELECT
       |    ' ' || rtrim(regexp_replace(w, '(.)', '\\1  ', 'g')) || ' ' AS rep, freq
       |  FROM (SELECT w, count(*) AS freq
       |        FROM (SELECT unnest(${TextOps.tokensSql(s"lower($textCol)")}) AS w
       |              FROM $table)
       |        WHERE regexp_matches(w, '^[a-z]{2,20}$$') GROUP BY w)),
       |$blocks""".stripMargin
  }

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
