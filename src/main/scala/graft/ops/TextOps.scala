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
    * end of the text. Returns one row per (doc, chunk) with the chunk's
    * index, length, and content fingerprint (the fingerprint keeps the
    * output narrow — downstream near-dup or embedding stages re-derive
    * the text from (doc_id, chunk_idx) when they need it).
    *
    * Scale shape: a generator (posexplode) over a per-row sequence —
    * embarrassingly parallel, no shuffle; output row count is
    * len/stride per doc, so partition sizing follows directly from
    * `maxPartitionBytes` on the scan.
    */
  def charChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, size: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0 && stride > 0, s"size/stride must be positive: $size/$stride")
    val t = col(textCol)
    val nChunksMinus1 = ((length(t) - 1) / lit(stride)).cast("int")
    val exploded = df.where(length(t) > 0)
      .select(col(idCol), t.as("__t"),
        posexplode(sequence(lit(0), nChunksMinus1)).as(Seq("chunk_idx", "__i")))
    val chunk = col("__t").substr(col("chunk_idx") * stride + 1, lit(size))
    exploded.select(col(idCol), col("chunk_idx"),
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
    size(filter(tokens(c), t => t.isin(words.map(lit): _*)))

  def stopHitsSql(e: String, words: Seq[String]): String =
    s"len(list_filter(${tokensSql(e)}, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Predicted language: argmax of stopword hits, first-language tiebreak
    * (reverse foldLeft builds the when-chain so the FIRST language with
    * the max score wins, matching the oracle's CASE order).
    */
  def langId(c: Column): Column = {
    val scores = langStopwords.map { case (_, ws) => stopHits(c, ws) }
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
}
