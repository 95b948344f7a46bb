package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ExprBridge
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Text-analysis operators for large-scale training-data pipelines:
  * token stats, language ID (stopword heuristic), quality scoring,
  * and document fingerprinting (position-weighted rolling hash).
  *
  * Everything here is a pure Catalyst `Column` expression (codegen'd,
  * no UDFs, no shuffles — per-row projections that scale linearly and
  * pipeline into whole-stage codegen). Each op has a DuckDB rendering
  * for the t2 oracle; the hash primitives use EXACT int64 arithmetic
  * (all intermediates < 2^63) so both engines agree bit-for-bit.
  *
  * Scale note (100 TB): all ops are embarrassingly parallel; the only
  * care is skew in document length, which `spark.sql.files.maxPartitionBytes`
  * handles at the scan.
  */
object TextOps {

  /** Whitespace tokenization (fixture docs are single-space soup; the
    * regex form handles arbitrary runs).
    */
  def tokens(c: Column): Column = split(trim(c), "\\s+")
  def tokensSql(e: String): String = s"string_split_regex(trim($e), '\\s+')"

  // ---- exact-arithmetic string hash ------------------------------------
  // charHash(s) = sum_i cp_i * ((i * 2654435761) % 1000003)  (i 1-based)
  //   cp < 2^21, multiplier < 1e6, len < 2^20  =>  sum < 2^62: exact.
  // tokenHash(s) = charHash(s) % 1000000007
  // Mirrors: Knuth multiplicative step for position mixing; mod-prime
  // bucket hash. No engine-native hash() is used anywhere (Spark's
  // murmur3 and DuckDB's hash are incompatible).

  val HashP = 1000000007L
  private val Mix = 2654435761L
  private val MixMod = 1000003L

  def charHash(c: Column): Column =
    aggregate(
      zip_with(
        split(c, ""),
        sequence(lit(1), length(c)),
        (ch, i) => ascii(ch) * ((i.cast(LongType) * lit(Mix)) % lit(MixMod))),
      lit(0L),
      (acc, x) => acc + x)

  /** Kernel-backed (StaticInvoke): Catalyst higher-order functions are
    * interpreted per element — the [[charHash]] formulation costs ~50x
    * more than [[TextKernels.tokenHash]]'s JVM loop and is kept only as
    * the executable spec of the formula.
    */
  def tokenHash(c: Column): Column = ExprBridge.column(StaticInvoke(
    TextKernels.getClass, LongType, "tokenHash",
    Seq(ExprBridge.expression(c.cast(StringType))), Seq(StringType),
    propagateNull = true, returnNullable = true))

  def charHashSql(e: String): String =
    s"CAST(list_sum(list_transform(range(1, length($e) + 1), i -> " +
      s"unicode($e[i]) * ((i * $Mix) % $MixMod))) AS BIGINT)"

  def tokenHashSql(e: String): String = {
    // bind e once: it is indexed per-char inside the lambda
    val body = charHashSql("s")
    s"(list_transform([CAST($e AS VARCHAR)], s -> $body)[1] % $HashP)"
  }

  /** [[tokenHash]] of every element of a PRE-BOUND token-array column
    * (kernel loop; see [[TextKernels.hashArr]]) — hash-space censuses
    * over a checkpointed token frame use this instead of re-splitting
    * the text.
    */
  def tokenHashesOf(toks: Column): Column = ExprBridge.column(StaticInvoke(
    TextKernels.getClass,
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false),
    "hashArr", Seq(ExprBridge.expression(toks)),
    Seq(org.apache.spark.sql.types.ArrayType(StringType)),
    propagateNull = true, returnNullable = true))

  /** Oracle rendering of [[tokenHashesOf]] over a bound list expr. */
  def tokenHashesOfSql(toksExpr: String): String =
    s"list_transform($toksExpr, x -> ${tokenHashSql("x")})"

  /** Within-doc token census as (token, c) structs
    * ([[TextKernels.tokenCensusEntries]]) — the string-keyed feed for
    * index builds whose output needs the token text.
    */
  def tokenCensusEntriesOf(toks: Column): Column =
    ExprBridge.column(StaticInvoke(
      TextKernels.getClass,
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("token", StringType,
            nullable = false),
          org.apache.spark.sql.types.StructField("c", LongType,
            nullable = false))), containsNull = false),
      "tokenCensusEntries", Seq(ExprBridge.expression(toks)),
      Seq(org.apache.spark.sql.types.ArrayType(StringType)),
      propagateNull = true, returnNullable = true))

  /** Packed adjacent-bigram fingerprints `h_i·P + h_{i+1}` over a
    * pre-bound token array ([[TextKernels.bigramFps]]): the 8-byte
    * shuffle key for bigram censuses — invertible by `div P` / `% P`
    * so marginal joins never need the bigram string.
    */
  def bigramFpsOf(toks: Column): Column = ExprBridge.column(StaticInvoke(
    TextKernels.getClass,
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false),
    "bigramFps", Seq(ExprBridge.expression(toks)),
    Seq(org.apache.spark.sql.types.ArrayType(StringType)),
    propagateNull = true, returnNullable = true))

  /** Oracle rendering of [[bigramFpsOf]] over a BOUND hashed-token
    * list expr (bind [[tokenHashesOfSql]] in a prior CTE — the list is
    * indexed twice per element here).
    */
  def bigramFpsOfSql(thExpr: String): String =
    s"list_transform(range(1, greatest(len($thExpr) - 1, 0) + 1), " +
      s"i -> ($thExpr)[i] * $HashP + ($thExpr)[i + 1])"

  /** Position-weighted document fingerprint over the token sequence:
    * fp = (sum_i tokenHash(t_i) * ((i * Mix) % MixMod)) % P  (i 1-based).
    * tokenHash < 1e9, multiplier < 1e6, 400 tokens => sum < 2^59: exact.
    * Kernel-backed ([[TextKernels.fingerprint]]).
    */
  def fingerprint(textCol: Column): Column = ExprBridge.column(StaticInvoke(
    TextKernels.getClass, LongType, "fingerprint",
    Seq(ExprBridge.expression(textCol.cast(StringType))), Seq(StringType),
    propagateNull = true, returnNullable = true))

  def fingerprintSql(e: String): String = {
    val tok = tokensSql(e)
    s"(CAST(list_sum(list_transform(range(1, len($tok) + 1), i -> " +
      s"${tokenHashSql(s"($tok)[i]")} * ((i * $Mix) % $MixMod))) AS BIGINT) % $HashP)"
  }

  // ---- token statistics -------------------------------------------------

  def nTokens(c: Column): Column = size(tokens(c))
  def nDistinctTokens(c: Column): Column = size(array_distinct(tokens(c)))

  /** Mean token length, as double. */
  def avgTokenLen(c: Column): Column =
    aggregate(transform(tokens(c), t => length(t).cast(LongType)),
      lit(0L), (acc, x) => acc + x).cast(DoubleType) / size(tokens(c))

  def nTokensSql(e: String): String = s"len(${tokensSql(e)})"
  def nDistinctTokensSql(e: String): String = s"len(list_distinct(${tokensSql(e)}))"
  def avgTokenLenSql(e: String): String =
    s"(CAST(list_sum(list_transform(${tokensSql(e)}, t -> length(t))) AS DOUBLE) / len(${tokensSql(e)}))"

  // ---- BPE-ish subword tokenization -------------------------------------

  /** GPT2-style (simplified, RE2-safe: no lookarounds) subword split:
    * space-prefixed letter runs, digit runs, punctuation runs, space
    * runs. Alternation is leftmost-first in BOTH Java regex and RE2 —
    * verified to tokenize identically.
    */
  val bpePattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit(bpePattern), lit(0))

  def nBpeTokens(c: Column): Column = size(bpeTokens(c)).cast(LongType)

  def nBpeTokensSql(e: String): String =
    s"len(regexp_extract_all($e, '$bpePattern'))"

  // ---- context-window chunking ------------------------------------------

  /** Split each document into fixed-size overlapping character chunks —
    * the RAG/context-window prep stage: chunk i covers
    * [i·stride, i·stride + size), i ranging until the starts pass the
    * end of the text. Returns one row per (doc, chunk). Schema depends
    * on `withText`:
    *  - `withText = false` (default): (idCol, chunk_idx, chunk_len,
    *    chunk_fp) — the fingerprint keeps the output narrow; downstream
    *    near-dup or embedding stages re-derive the text from
    *    (doc_id, chunk_idx) when they need it;
    *  - `withText = true`: (idCol, chunk_idx, chunk) — the chunk TEXT
    *    itself, for stages (e.g. retrieval indexing) that consume the
    *    payload directly; chunk_len/chunk_fp are not emitted.
    *
    * Scale shape: a generator (posexplode) over a per-row sequence —
    * embarrassingly parallel, no shuffle; output row count is
    * len/stride per doc, so partition sizing follows directly from
    * `maxPartitionBytes` on the scan.
    */
  def charChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, stride: Int,
      withText: Boolean = false): org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive: $size/$stride")
    val t = col(textCol)
    val nChunksMinus1 = ((length(t) - 1) / lit(stride)).cast("int")
    val exploded = df.where(length(t) > 0)
      .select(col(idCol), t.as("__t"),
        posexplode(sequence(lit(0), nChunksMinus1)).as(Seq("chunk_idx", "__i")))
    val chunk = col("__t").substr(col("chunk_idx") * stride + 1, lit(size))
    if (withText) exploded.select(col(idCol), col("chunk_idx"),
      chunk.as("chunk"))
    else exploded.select(col(idCol), col("chunk_idx"),
      length(chunk).as("chunk_len"),
      fingerprint(chunk).as("chunk_fp"))
  }

  /** [[charChunks]] oracle rendering: the chunk-exploding CTE body
    * (callers wrap it and apply [[fingerprintSql]] on the `chunk`
    * column it emits).
    */
  def charChunksSql(table: String, idCol: String, textCol: String,
      size: Int, stride: Int): String =
    s"""SELECT $idCol, CAST(i AS INTEGER) AS chunk_idx,
       |  substr($textCol, CAST(i * $stride + 1 AS INTEGER), $size) AS chunk
       |FROM (SELECT $idCol, $textCol,
       |        unnest(range(0, (length($textCol) - 1) // $stride + 1)) AS i
       |      FROM $table WHERE length($textCol) > 0)""".stripMargin

  // ---- text normalization -------------------------------------------------

  /** Unicode/controls/whitespace normalization — see
    * [[TextKernels.normalizeText]] for the contract. Kernel-backed
    * (StaticInvoke), codegen-friendly, embarrassingly parallel.
    */
  def normalizeText(c: Column): Column = ExprBridge.column(StaticInvoke(
    TextKernels.getClass, StringType, "normalizeText",
    Seq(ExprBridge.expression(c.cast(StringType))), Seq(StringType),
    propagateNull = true, returnNullable = true))

  /** [[normalizeText]] oracle rendering: DuckDB `nfc_normalize`, then
    * the same strip → collapse → trim stages (RE2 `\\x` classes; after
    * the control strip only U+0020 space runs remain, so the collapse
    * pattern is the literal double space — no `\\s` semantics gap
    * between Java regex and RE2 can apply).
    */
  def normalizeTextSql(e: String): String =
    s"trim(regexp_replace(regexp_replace(nfc_normalize($e), " +
      "'[\\x00-\\x1f\\x7f]', '', 'g'), '  +', ' ', 'g'), ' ')"

  // ---- token n-grams (with multiplicity) ---------------------------------

  /** Token k-grams as strings ("w1 w2 w3"), WITH multiplicity — the
    * counting form ([[graft.ops.DedupOps.shingles]] is the distinct-set
    * form for Jaccard/MinHash). Guarded for short docs: Spark's
    * `sequence(1, 0)` counts DOWN (unlike DuckDB's end-exclusive empty
    * `range`), so the < k case must short-circuit.
    */
  def ngrams(c: Column, k: Int): Column = ngramsOf(tokens(c), k)

  /** [[ngrams]] over a PRE-BOUND token-array column. Callers on a hot
    * path should project `tokens(text)` into a named column first and
    * pass that: a raw-text `ngrams` re-splits the string inside every
    * `slice` lambda step (O(tokens²) splits per doc), and Catalyst's
    * CollapseProject deliberately keeps the two-step projection apart
    * because the split is non-cheap and multiply-referenced.
    */
  def ngramsOf(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(
        sequence(lit(1), size(toks) - (k - 1)),
        i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  def ngramsSql(e: String, k: Int): String = {
    val tok = tokensSql(e)
    s"list_transform(range(1, greatest(len($tok) - ${k - 1}, 0) + 1), " +
      s"i -> array_to_string(($tok)[i:i+${k - 1}], ' '))"
  }

  // ---- language ID (stopword-count heuristic) ---------------------------

  /** Tiny per-language stopword lists (public common words). Order is
    * the tiebreak order: on equal scores the EARLIER language wins.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "los", "una"),
    "fr" -> Seq("le", "la", "de", "et", "un", "les", "des"),
    "zh" -> Seq("的", "是", "不", "了", "在"))

  /** Stopword hit count (with multiplicity) for one language. */
  def stopHits(c: Column, words: Seq[String]): Column =
    stopHitsOf(tokens(c), words)

  /** [[stopHits]] over a PRE-BOUND token-array column (the hot-path
    * form — see [[ngramsOf]] for the bind-once rationale).
    */
  def stopHitsOf(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*)))

  def stopHitsSql(e: String, words: Seq[String]): String =
    s"len(list_filter(${tokensSql(e)}, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Predicted language: argmax of stopword hits, first-language tiebreak
    * (reverse foldLeft builds the when-chain so the FIRST language with
    * the max score wins, matching the oracle's CASE order).
    */
  def langId(c: Column): Column = langIdOf(tokens(c))

  /** [[langId]] over a PRE-BOUND token-array column. The single-
    * expression `langId(text)` embeds `tokens(text)` inside each of
    * the 5 per-language `stopHits` filters plus the `greatest` — the
    * `split` subtree evaluates up to 6× per row in one projection
    * (higher-order-function CSE is unreliable, and CollapseProject
    * keeps multiply-referenced non-cheap aliases apart rather than
    * inlining them — which is exactly why callers should bind the
    * token array in a prior projection and pass it here, mirroring
    * the oracle's bind-once `list_transform` trick in [[langIdSql]]).
    */
  def langIdOf(toks: Column): Column = {
    val scores = langStopwords.map { case (_, ws) => stopHitsOf(toks, ws) }
    val maxScore = greatest(scores: _*)
    langStopwords.zip(scores).reverse.foldLeft(lit("und")) {
      case (els, ((lang, _), s)) =>
        when(s === maxScore && maxScore > 0, lit(lang)).otherwise(els)
    }
  }

  def langIdSql(e: String): String = {
    val scores = langStopwords.map { case (_, ws) => stopHitsSql("s", ws) }
    val maxE = s"greatest(${scores.mkString(", ")})"
    val branches = langStopwords.zip(scores).map { case ((lang, _), sc) =>
      s"WHEN $sc = __mx AND __mx > 0 THEN '$lang'"
    }.mkString(" ")
    // bind text + max score once
    s"(list_transform([CAST($e AS VARCHAR)], s -> " +
      s"list_transform([$maxE], __mx -> CASE $branches ELSE 'und' END)[1])[1])"
  }

  // ---- quality score ----------------------------------------------------

  /** Composite quality score in [0,1]:
    * 0.3·min(1, nTokens/100) + 0.3·stopwordRatio(en)
    * + 0.2·min(1, avgTokenLen/8) + 0.2·distinctRatio.
    * Same floating-op order in both renderings (parity).
    */
  /** Gopher-style repetition ratio: the fraction of k-gram slots whose
    * shingle repeats one seen earlier in the document
    * (1 - distinct/total; 0 for docs shorter than k tokens). High
    * values flag boilerplate — a standard training-data quality
    * filter. Composes the existing shingle kernel; per-row projection,
    * no shuffle.
    */
  def repetitionRatio(c: Column, k: Int = 3): Column = {
    val total = greatest(size(tokens(c)) - (k - 1), lit(0)).cast(DoubleType)
    val distinct = size(DedupOps.shingleHashes(c, k)).cast(DoubleType)
    when(total > 0, lit(1.0) - distinct / total).otherwise(lit(0.0))
  }

  def repetitionRatioSql(e: String, k: Int = 3): String = {
    val tok = tokensSql(e)
    val total = s"CAST(greatest(len($tok) - ${k - 1}, 0) AS DOUBLE)"
    val distinct = s"CAST(len(${DedupOps.shingleHashesSql(e, k)}) AS DOUBLE)"
    s"(CASE WHEN $total > 0 THEN CAST(1.0 AS DOUBLE) - $distinct / $total ELSE CAST(0.0 AS DOUBLE) END)"
  }

  def qualityScore(c: Column): Column = {
    val n = nTokens(c).cast(DoubleType)
    val lenScore = least(lit(1.0), n / lit(100.0))
    val stopRatio = stopHits(c, langStopwords.toMap.apply("en")).cast(DoubleType) / n
    val wlenScore = least(lit(1.0), avgTokenLen(c) / lit(8.0))
    val distinctRatio = nDistinctTokens(c).cast(DoubleType) / n
    lit(0.3) * lenScore + lit(0.3) * stopRatio +
      lit(0.2) * wlenScore + lit(0.2) * distinctRatio
  }

  // ---- Gopher-style rule filter ------------------------------------------

  /** Gopher-style document quality rules (Rae et al. 2021 §A1.1,
    * adapted to the fixture's whitespace soup): per-doc boolean flags
    * plus the conjunction, so a curation pipeline can both FILTER on
    * `pass` and AUDIT which rule rejected what (per-rule reject counts
    * are one groupBy away — at 100 TB you alert on a rule's reject
    * rate drifting, not on individual docs).
    *
    *   r_ntok  token count within [minTok, maxTok]
    *   r_wlen  mean token length within [minWlen, maxWlen]
    *   r_alpha fraction of tokens containing a letter >= minAlphaFrac
    *   r_stop  at least minStopDistinct DISTINCT English stopwords
    *   r_rep   3-gram repetition ratio <= maxRep (boilerplate gate)
    *
    * All comparisons are on exact IEEE results of integer-derived
    * divisions — identical in any engine, so the flags need no
    * rounding. Pure per-row projection: no shuffle, embarrassingly
    * parallel.
    */
  def gopherFlags(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minTok: Int = 50, maxTok: Int = 100000,
      minWlen: Double = 3.0, maxWlen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopDistinct: Int = 2,
      maxRep: Double = 0.2): org.apache.spark.sql.DataFrame = {
    val c = col(textCol)
    val n = nTokens(c)
    val nD = n.cast(DoubleType)
    val wlen = avgTokenLen(c)
    val alphaFrac =
      size(filter(tokens(c), t => t.rlike("[A-Za-z]"))).cast(DoubleType) / nD
    val stopDistinct = size(array_intersect(
      array_distinct(tokens(c)),
      array(langStopwords.toMap.apply("en").map(lit): _*)))
    def safe(flag: Column): Column = coalesce(flag, lit(false))
    df.select(col(idCol), n.cast("long").as("n_tok"),
      safe(n >= minTok && n <= maxTok).as("r_ntok"),
      safe(wlen >= minWlen && wlen <= maxWlen).as("r_wlen"),
      safe(alphaFrac >= minAlphaFrac).as("r_alpha"),
      safe(stopDistinct >= minStopDistinct).as("r_stop"),
      safe(repetitionRatio(c) <= maxRep).as("r_rep"))
      .withColumn("pass",
        col("r_ntok") && col("r_wlen") && col("r_alpha") &&
          col("r_stop") && col("r_rep"))
  }

  /** [[gopherFlags]] oracle rendering. */
  def gopherFlagsSql(table: String, idCol: String, textCol: String,
      minTok: Int = 50, maxTok: Int = 100000,
      minWlen: Double = 3.0, maxWlen: Double = 10.0,
      minAlphaFrac: Double = 0.8, minStopDistinct: Int = 2,
      maxRep: Double = 0.2): String = {
    val en = langStopwords.toMap.apply("en").map(w => s"'$w'").mkString(", ")
    val tok = tokensSql(textCol)
    val n = nTokensSql(textCol)
    val nD = s"CAST($n AS DOUBLE)"
    val wlen = avgTokenLenSql(textCol)
    val alphaFrac =
      s"(CAST(len(list_filter($tok, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / $nD)"
    val stopDistinct = s"len(list_intersect(list_distinct($tok), [$en]))"
    val rep = repetitionRatioSql(textCol)
    s"""SELECT $idCol, $n AS n_tok,
       |  coalesce($n >= $minTok AND $n <= $maxTok, false) AS r_ntok,
       |  coalesce($wlen >= $minWlen AND $wlen <= $maxWlen, false) AS r_wlen,
       |  coalesce($alphaFrac >= $minAlphaFrac, false) AS r_alpha,
       |  coalesce($stopDistinct >= $minStopDistinct, false) AS r_stop,
       |  coalesce($rep <= $maxRep, false) AS r_rep,
       |  coalesce($n >= $minTok AND $n <= $maxTok, false)
       |    AND coalesce($wlen >= $minWlen AND $wlen <= $maxWlen, false)
       |    AND coalesce($alphaFrac >= $minAlphaFrac, false)
       |    AND coalesce($stopDistinct >= $minStopDistinct, false)
       |    AND coalesce($rep <= $maxRep, false) AS pass
       |FROM $table""".stripMargin
  }

  // ---- TF-IDF top terms ---------------------------------------------------

  /** Top-k TF-IDF terms per document — the classic keyword/feature
    * extractor (`tfidf = tf · ln(N/df)`). Scores are n4-rounded BEFORE
    * ranking so both engines rank on the same grid; ties break on the
    * term string. Returns (idCol, term, tf, df, tfidf, rank).
    *
    * Scale shape: one token-keyed shuffle builds per-(doc, term)
    * counts; document frequency is a partial-aggregable rollup of that
    * frame; the scoring join is term-keyed; the final top-k is a
    * per-doc window that Spark executes as WindowGroupLimit (rank
    * pushdown — no full sort of the scored frame). N is one driver
    * scalar. Nothing collects or broadcasts the vocabulary.
    */
  def tfidfTopTerms(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, kTop: Int): org.apache.spark.sql.DataFrame = {
    require(kTop > 0, s"kTop must be positive: $kTop")
    val nDocs = df.count()
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(dfreq, "term")
      .withColumn("tfidf",
        floor(col("tf").cast(DoubleType) *
          log(lit(nDocs.toDouble) / col("df").cast(DoubleType)) *
          lit(10000d) + lit(0.5d)).cast(DoubleType) / lit(10000d))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= kTop)
      .select(col(idCol), col("term"), col("tf"), col("df"),
        col("tfidf"), col("rank"))
  }

  /** [[tfidfTopTerms]] oracle rendering. */
  def tfidfTopTermsSql(table: String, idCol: String, textCol: String,
      kTop: Int): String =
    s"""WITH toks AS (SELECT $idCol, unnest(${tokensSql(textCol)}) AS term
       |              FROM $table),
       |tf AS (SELECT $idCol, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM $table),
       |scored AS (SELECT $idCol, term, tf, df,
       |    ${graft.etl.OracleSql.n4("CAST(tf AS DOUBLE) * ln(n / CAST(df AS DOUBLE))")} AS tfidf
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
       |ranked AS (SELECT *, row_number() OVER
       |    (PARTITION BY $idCol ORDER BY tfidf DESC, term) AS rank
       |  FROM scored)
       |SELECT $idCol, term, tf, df, tfidf, CAST(rank AS INTEGER) AS rank
       |FROM ranked WHERE rank <= $kTop""".stripMargin

  // ---- BM25 keyword search -------------------------------------------------

  /** BM25 top-k retrieval for a fixed term set (Robertson/Spärck Jones;
    * the Lucene-default `ln(1 + (N - df + 0.5)/(df + 0.5))` idf, so
    * scores are always positive). Cross-engine float discipline:
    * per-term scores are evaluated in ONE fixed parenthesization and
    * floored onto a 1e-6 grid as integer micro-scores; the per-doc
    * score is then an ORDER-INDEPENDENT integer sum — exact on any
    * engine, no float-reduction drift. Returns (idCol, score_u)
    * descending, doc-id tiebreak.
    *
    * Scale shape: the term filter runs map-side BEFORE the (doc, term)
    * aggregate, so only matching postings shuffle (a handful of terms,
    * not the corpus vocabulary); (N, avgdl) are one driver scalar pair;
    * the final top-k is a k-row TakeOrdered, never a global sort
    * materialization.
    */
  def bm25TopK(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, terms: Seq[String], kTop: Int,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    require(kTop > 0, s"kTop must be positive: $kTop")
    val docs = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast(LongType))
    val stats = docs.agg(count(lit(1)), sum("dl")).head()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / nDocs
    val tf = docs.select(col(idCol), col("dl"), explode(col("__toks")).as("term"))
      .where(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    val dfD = col("df").cast(DoubleType)
    val tfD = col("tf").cast(DoubleType)
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - dfD + lit(0.5)) / (dfD + lit(0.5)))
    val denom = tfD + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast(DoubleType) / lit(avgdl))
    val termScore = idf * (tfD * lit(k1 + 1.0)) / denom
    tf.join(tf.groupBy("term").agg(count(lit(1)).as("df")), "term")
      .select(col(idCol),
        floor(termScore * lit(1000000.0) + lit(0.5)).cast(LongType).as("s_u"))
      .groupBy(idCol).agg(sum("s_u").as("score_u"))
      .orderBy(col("score_u").desc, col(idCol))
      .limit(kTop)
  }

  /** [[bm25TopK]] oracle rendering. Float literals are injected via
    * `Double.toString` (shortest round-trip repr), so DuckDB parses the
    * EXACT same doubles Spark's `lit` embeds.
    */
  def bm25TopKSql(table: String, idCol: String, textCol: String,
      terms: Seq[String], kTop: Int,
      k1: Double = 1.2, b: Double = 0.75,
      extraCtes: String = ""): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val idf = s"ln(1.0 + (n - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
    val denom = s"CAST(tf AS DOUBLE) + $k1 * (1.0 - $b + $b * CAST(dl AS DOUBLE) / avgdl)"
    val termScore = s"$idf * (CAST(tf AS DOUBLE) * ${k1 + 1.0}) / ($denom)"
    val prelude = if (extraCtes.isEmpty) "" else s"$extraCtes,\n"
    s"""WITH ${prelude}dld AS (SELECT $idCol, ${tokensSql(textCol)} AS toks,
       |    CAST(${nTokensSql(textCol)} AS BIGINT) AS dl FROM $table),
       |tot AS (SELECT CAST(count(*) AS DOUBLE) AS n,
       |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dld),
       |tf AS (SELECT $idCol, dl, term, count(*) AS tf
       |  FROM (SELECT $idCol, dl, unnest(toks) AS term FROM dld)
       |  WHERE term IN ($termList) GROUP BY 1, 2, 3),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (SELECT $idCol,
       |    CAST(floor(($termScore) * 1000000.0 + 0.5) AS BIGINT) AS s_u
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot)
       |SELECT $idCol, CAST(sum(s_u) AS BIGINT) AS score_u FROM scored
       |GROUP BY $idCol ORDER BY score_u DESC, $idCol LIMIT $kTop""".stripMargin
  }

  // ---- unigram log-probability scoring ----------------------------------

  /** Perplexity-style quality statistic: each document's mean negative
    * log-probability under the corpus's own add-one-smoothed unigram
    * model, `nll(d) = -avg_t ln((count(t)+1)/(N+V))` — the standard
    * "train a cheap LM on the corpus, drop the surprising tail" filter
    * (high nll = rare-token soup, low = common-token boilerplate).
    * Returns (idCol, n_tok, nll).
    *
    * Scale shape: ONE token-keyed shuffle builds the vocabulary
    * counts; the scoring join re-uses that same token partitioning
    * (exchange reuse, no second vocab shuffle) and one doc-keyed
    * aggregate folds scores. Corpus totals (N, V) are two scalars
    * collected driver-side and injected as literals — the same
    * stats-flow-driver-ward pattern as the cleaners. Nothing
    * broadcasts the (unbounded) vocabulary.
    */
  def unigramLogprob(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum("c").as("n"), count(lit(1)).as("v")).head()
    val denom = (tot.getLong(0) + tot.getLong(1)).toDouble
    toks.join(counts, "tok")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"),
        (-avg(log((col("c") + lit(1)).cast(DoubleType) / lit(denom)))).as("nll"))
  }

  /** [[unigramLogprob]] oracle rendering over a one-table corpus. */
  def unigramLogprobSql(table: String, idCol: String, textCol: String): String =
    s"""WITH toks AS (SELECT $idCol, unnest(${tokensSql(textCol)}) AS tok
       |              FROM $table),
       |counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
       |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM counts)
       |SELECT $idCol, count(*) AS n_tok,
       |  -avg(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))) AS nll
       |FROM toks JOIN counts USING (tok) CROSS JOIN tot
       |GROUP BY $idCol""".stripMargin

  // ---- PII redaction ----------------------------------------------------

  /** RE2-safe patterns (no lookarounds/backreferences), so the Java
    * regex and DuckDB/RE2 renderings match the exact same spans.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val ipPattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Scrub emails / phone numbers / IPv4 addresses with typed
    * placeholders — the standard pre-training privacy pass. Email runs
    * first (redacting it removes dotted digit runs that could
    * otherwise be half-matched as IPs). Pure per-row projection,
    * codegen'd regexp — embarrassingly parallel at any scale.
    */
  def redactPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, emailPattern, "<EMAIL>"),
        phonePattern, "<PHONE>"),
      ipPattern, "<IP>")

  /** Number of placeholders [[redactPii]] inserts — EXACTLY: each
    * category is counted on the string the corresponding redaction
    * stage actually sees (counting all three on the raw string can
    * disagree, e.g. "1.2.3.4@example.com" is one email redaction but
    * would raw-count as email + IP).
    */
  def piiCount(c: Column): Column = {
    val afterEmail = regexp_replace(c, emailPattern, "<EMAIL>")
    val afterPhone = regexp_replace(afterEmail, phonePattern, "<PHONE>")
    (regexp_count(c, lit(emailPattern)) +
      regexp_count(afterEmail, lit(phonePattern)) +
      regexp_count(afterPhone, lit(ipPattern))).cast(LongType)
  }

  def redactPiiSql(e: String): String =
    s"regexp_replace(regexp_replace(regexp_replace($e, '$emailPattern', '<EMAIL>', 'g'), " +
      s"'$phonePattern', '<PHONE>', 'g'), '$ipPattern', '<IP>', 'g')"

  def piiCountSql(e: String): String = {
    val afterEmail = s"regexp_replace($e, '$emailPattern', '<EMAIL>', 'g')"
    val afterPhone = s"regexp_replace($afterEmail, '$phonePattern', '<PHONE>', 'g')"
    s"(len(regexp_extract_all($e, '$emailPattern')) + " +
      s"len(regexp_extract_all($afterEmail, '$phonePattern')) + " +
      s"len(regexp_extract_all($afterPhone, '$ipPattern')))"
  }

  def qualityScoreSql(e: String): String = {
    val n = s"CAST(${nTokensSql("s")} AS DOUBLE)"
    val en = langStopwords.toMap.apply("en")
    s"(list_transform([CAST($e AS VARCHAR)], s -> " +
      s"0.3 * least(CAST(1.0 AS DOUBLE), $n / 100.0) + " +
      s"0.3 * (CAST(${stopHitsSql("s", en)} AS DOUBLE) / $n) + " +
      s"0.2 * least(CAST(1.0 AS DOUBLE), ${avgTokenLenSql("s")} / 8.0) + " +
      s"0.2 * (CAST(${nDistinctTokensSql("s")} AS DOUBLE) / $n))[1])"
  }

  // ---- boilerplate line removal (C4-style) --------------------------------

  /** Remove every line that appears verbatim in >= `minDocs` distinct
    * documents (the C4/CCNet boilerplate pass: nav bars, cookie
    * banners, "subscribe" footers repeat across a site; body text does
    * not). Returns one row per input doc: (idCol, clean_text,
    * n_removed), with surviving lines rejoined in original order and
    * docs whose every line was boilerplate kept as empty strings.
    *
    * Scale shape: the hot-line census shuffles 8-byte `xxhash64` line
    * keys, never line payloads (the [[DedupOps.exactDedup]]
    * fingerprint-first discipline); the hot set — lines repeated
    * across >= minDocs docs — is tiny relative to the corpus, so the
    * anti-join broadcasts under AQE. The rebuild is ONE doc-keyed
    * shuffle of surviving lines; per-doc line order is restored with
    * an in-group array_sort, never a global sort.
    */
  def dropBoilerplateLines(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      minDocs: Long): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    // null text = empty text, so the op is total (without the coalesce
    // a null doc would posexplode to nothing AND score size() = -1 in
    // the line census below, surfacing as n_removed = -1)
    val text = coalesce(col(textCol), lit(""))
    val lines = df.select(col(idCol),
      posexplode(split(text, "\n", -1)).as(Seq("pos", "line")))
    val hot = lines
      .select(xxhash64(col("line")).as("lh"), col(idCol))
      .groupBy("lh").agg(countDistinct(col(idCol)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select("lh")
    val kept = lines.withColumn("lh", xxhash64(col("line")))
      .join(hot, Seq("lh"), "left_anti")
    val rebuilt = kept.groupBy(idCol).agg(
      array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line")), "\n").as("clean_text"),
      count(lit(1)).as("n_kept"))
    df.select(col(idCol),
        size(split(text, "\n", -1)).cast(LongType).as("__n_lines"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("__n_lines") - coalesce(col("n_kept"), lit(0L)))
          .cast(LongType).as("n_removed"))
  }

  /** [[dropBoilerplateLines]] oracle rendering. The oracle censuses
    * the raw line text where the engine shuffles its hash — same
    * semantics (xxhash64 collisions aside), independent mechanism.
    */
  def dropBoilerplateLinesSql(table: String, idCol: String,
      textCol: String, minDocs: Long, extraCtes: String = ""): String = {
    val prelude = if (extraCtes.isEmpty) "" else s"$extraCtes,\n"
    s"""WITH ${prelude}__lines AS (
       |  SELECT $idCol, CAST(i AS INTEGER) AS pos,
       |    string_split($textCol, chr(10))[CAST(i + 1 AS INTEGER)] AS line
       |  FROM (SELECT $idCol, $textCol,
       |          unnest(range(0, len(string_split($textCol, chr(10))))) AS i
       |        FROM $table)),
       |__hot AS (SELECT line FROM __lines GROUP BY line
       |          HAVING count(DISTINCT $idCol) >= $minDocs),
       |__kept AS (SELECT * FROM __lines
       |           WHERE line NOT IN (SELECT line FROM __hot)),
       |__rebuilt AS (SELECT $idCol,
       |    string_agg(line, chr(10) ORDER BY pos) AS clean_text,
       |    count(*) AS n_kept
       |  FROM __kept GROUP BY $idCol)
       |SELECT d.$idCol, coalesce(r.clean_text, '') AS clean_text,
       |  CAST(len(string_split(d.$textCol, chr(10))) - coalesce(r.n_kept, 0)
       |    AS BIGINT) AS n_removed
       |FROM $table d LEFT JOIN __rebuilt r USING ($idCol)""".stripMargin
  }

  // ---- token-distribution entropy -----------------------------------------

  /** Shannon entropy of the document's token distribution in nats —
    * the cheap "gibberish or template?" signal (low entropy = repeated
    * template soup, high = diverse vocabulary). Cross-engine float
    * discipline: each distinct token's contribution
    * `-(c/n)·ln(c/n)` is evaluated in one fixed parenthesization and
    * floored onto a 1e-6 grid as an integer micro-score, so the
    * per-doc total is an ORDER-INDEPENDENT integer sum (DuckDB's
    * `list_distinct` does not promise first-occurrence order; an
    * integer sum makes that irrelevant). Returns micro-nats (BIGINT).
    *
    * Scale shape: pure per-row projection (higher-order functions over
    * the token array, O(distinct·n) per doc) — no shuffle, pipelines
    * into whole-stage codegen.
    */
  def tokenEntropyMicro(c: Column): Column = {
    val toks = tokens(c)
    val n = size(toks).cast(DoubleType)
    val contrib = transform(array_distinct(toks), t => {
      val cnt = size(filter(toks, x => x === t)).cast(DoubleType)
      floor((-(cnt / n) * log(cnt / n)) * lit(1000000.0) + lit(0.5))
        .cast(LongType)
    })
    when(size(toks) === 0, lit(0L))
      .otherwise(aggregate(contrib, lit(0L), (acc, x) => acc + x))
  }

  /** The SCALE path for token entropy: identical integer micro-nat
    * semantics as [[tokenEntropyMicro]] (same fixed parenthesization,
    * same 1e-6 floor, same order-independent integer sum — the SAME
    * oracle rendering verifies both), but computed via explode +
    * aggregation instead of the per-row O(distinct·n) higher-order
    * scan, which at 50k docs × ~128 tokens measured 9.5 s vs sub-second
    * for this form. Returns (idCol, n_tok, ent_u).
    *
    * Scale shape: one (id, token) aggregate, an id-keyed count join,
    * one id-keyed fold — the [[unigramLogprob]] pattern; every
    * exchange keys on id or (id, token), nothing quadratic per row.
    * Docs whose text tokenizes to nothing keep `split` semantics
    * (one empty token -> entropy 0), matching the Column form. Docs
    * with NULL text explode to no rows, so the aggregate is
    * LEFT-JOINED back to the id set: they surface as
    * (id, NULL, NULL) — exactly what the Column/kernel form and the
    * per-row oracle emit — instead of silently vanishing.
    */
  def tokenEntropyAgg(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val counts = toks.groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(idCol).agg(sum("c").as("n"))
    val cD = col("c").cast(DoubleType)
    val nD = col("n").cast(DoubleType)
    val termU = floor((-(cD / nD) * log(cD / nD)) * lit(1000000.0) + lit(0.5))
      .cast(LongType)
    val agg = counts.join(totals, idCol)
      .select(col(idCol), col("n"), termU.as("u"))
      .groupBy(idCol)
      .agg(first(col("n")).as("n_tok"), sum("u").as("ent_u"))
    df.select(col(idCol)).join(agg, Seq(idCol), "left")
  }

  /** [[tokenEntropyMicro]] oracle rendering. */
  def tokenEntropyMicroSql(e: String): String = {
    val toks = tokensSql(e)
    val cnt = s"CAST(len(list_filter(ts, x -> x = t)) AS DOUBLE)"
    val contrib = s"CAST(floor((-($cnt / n) * ln($cnt / n)) * 1000000.0 + 0.5) AS BIGINT)"
    s"(list_transform([$toks], ts -> CASE WHEN len(ts) = 0 THEN 0 ELSE " +
      s"(list_transform([CAST(len(ts) AS DOUBLE)], n -> " +
      s"CAST(list_sum(list_transform(list_distinct(ts), t -> $contrib)) AS BIGINT)))[1] " +
      s"END)[1])"
  }
}
