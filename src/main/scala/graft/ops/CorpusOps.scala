package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Corpus-level composition analytics: trigram novelty (how much of a
  * doc is first-seen), vocabulary coverage curves (the token budget a
  * tokenizer needs), and pairwise source vocabulary overlap (which
  * feeds dedup/mixing decisions between crawls). All reductions are
  * exact integer counts; each output ratio is ONE division of exact
  * integers — deterministic on any layout, no normalization needed.
  */
object CorpusOps {

  // ---- trigram novelty ---------------------------------------------------

  /** Per-doc novelty: the share of the doc's DISTINCT trigram
    * shingles whose first appearance (minimum doc id) is this doc.
    * Low novelty = mostly shingles already seen earlier in the
    * corpus — the cheap dedup-aware ordering signal for
    * curriculum/sampling decisions. Docs with < 3 tokens have no
    * shingles and drop out. Returns (idCol, n_tri, n_novel, novelty).
    *
    * Operates on the HASHED shingle space ([[DedupOps.shingleHashes]]
    * — the same fingerprint space every dedup op shuffles): the
    * kernel dedups within the doc in one JVM loop, so (doc, hash)
    * pairs are unique by construction and the wide string-pair
    * distinct shuffle disappears — what remains shuffles 8-byte
    * fingerprints, never trigram text (measured 2-4x over the string
    * formulation). Hash collisions are corpus-wide constants shared
    * bit-exactly by both engines (the oracle applies the same
    * arithmetic hash), not layout artifacts.
    *
    * Scale shape: one projection (kernel) + ONE fingerprint-keyed
    * shuffle whose exchange serves both the min-doc census and the
    * join back, + one doc-keyed fold.
    */
  def trigramNovelty(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = df
      .select(col(idCol), DedupOps.shingleHashes(col(textCol), 3).as("__hs"))
      .select(col(idCol), explode(col("__hs")).as("h"))
    val firsts = pairs.groupBy("h").agg(min(col(idCol)).as("fd"))
    pairs.join(firsts, "h")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tri"),
        sum(when(col("fd") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast(DoubleType) / col("n_tri").cast(DoubleType))
      .orderBy(idCol)
  }

  /** [[trigramNovelty]] oracle rendering. */
  def trigramNoveltySql(table: String, idCol: String, textCol: String): String =
    s"""WITH pairs AS (SELECT $idCol,
       |    unnest(${DedupOps.shingleHashesSql(textCol, 3)}) AS h FROM $table),
       |firsts AS (SELECT h, min($idCol) AS fd FROM pairs GROUP BY 1)
       |SELECT $idCol, count(*) AS n_tri,
       |  CAST(sum(CASE WHEN fd = $idCol THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  CAST(sum(CASE WHEN fd = $idCol THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS novelty
       |FROM pairs JOIN firsts USING (h)
       |GROUP BY $idCol ORDER BY $idCol""".stripMargin

  // ---- vocabulary coverage curve -----------------------------------------

  /** Top-`k` corpus vocabulary with the cumulative share of all token
    * occurrences each prefix covers — the "how big must the tokenizer
    * vocab be" curve. Total order (count desc, token) makes ranks and
    * the limit boundary deterministic. Returns
    * (rnk, tok, c, cum_c, share).
    *
    * Scale shape: one partial-aggregable token count + a k-row
    * TakeOrdered; the cumulative window then runs on k rows (a
    * constant), and the corpus total rides in as a 1-row broadcast.
    * The full vocabulary is never sorted globally.
    */
  def vocabCoverage(df: DataFrame, textCol: String, k: Int = 100): DataFrame = {
    val counts = df.select(explode(TextOps.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum(col("c")).cast(DoubleType).as("t"))
    val ord = Window.orderBy(col("c").desc, col("tok"))
    counts.orderBy(col("c").desc, col("tok")).limit(k)
      .withColumn("rnk", row_number().over(ord))
      .withColumn("cum_c", sum(col("c")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      // row_number is INT in Spark, BIGINT in DuckDB — emit BIGINT
      .select(col("rnk").cast("long").as("rnk"), col("tok"), col("c"),
        col("cum_c"),
        (col("cum_c").cast(DoubleType) / col("t")).as("share"))
      .orderBy("rnk")
  }

  /** [[vocabCoverage]] oracle rendering. */
  def vocabCoverageSql(table: String, textCol: String, k: Int = 100): String =
    s"""WITH counts AS (SELECT tok, count(*) AS c
       |  FROM (SELECT unnest(${TextOps.tokensSql(textCol)}) AS tok FROM $table)
       |  GROUP BY 1),
       |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM counts),
       |top AS (SELECT tok, c FROM counts ORDER BY c DESC, tok LIMIT $k),
       |curve AS (SELECT row_number() OVER (ORDER BY c DESC, tok) AS rnk, tok, c,
       |    CAST(sum(c) OVER (ORDER BY c DESC, tok
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
       |  FROM top)
       |SELECT rnk, tok, c, cum_c, CAST(cum_c AS DOUBLE) / t AS share
       |FROM curve CROSS JOIN tot ORDER BY rnk""".stripMargin

  // ---- pairwise source vocabulary overlap --------------------------------

  /** Jaccard overlap of DISTINCT vocabularies for every source pair
    * (s1 < s2): |V₁∩V₂| / |V₁∪V₂|. High overlap across crawls =
    * near-duplicate feeds; the mixing-weight sanity check. Returns
    * (s1, s2, inter, jaccard); pairs sharing no token drop out.
    *
    * Scale shape: one (source, token) dedup shuffle, a token-keyed
    * self-join whose per-token blowup is bounded by the SOURCE COUNT
    * squared (sources are few; tokens are many), and a tiny
    * source-pair fold with per-source sizes broadcast back.
    */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val st = df.select(col(srcCol).as("s"),
      explode(TextOps.tokens(col(textCol))).as("tok")).distinct()
    val sizes = st.groupBy("s").agg(count(lit(1)).as("nv"))
    val inter = st.join(st.select(col("s").as("s2"), col("tok")), "tok")
      .where(col("s") < col("s2"))
      .groupBy(col("s").as("s1"), col("s2"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(broadcast(sizes.select(col("s").as("s1"), col("nv").as("na"))), "s1")
      .join(broadcast(sizes.select(col("s").as("s2"), col("nv").as("nb"))), "s2")
      .select(col("s1"), col("s2"), col("inter"),
        (col("inter").cast(DoubleType) /
          (col("na") + col("nb") - col("inter")).cast(DoubleType)).as("jaccard"))
      .orderBy("s1", "s2")
  }

  // ---- PMI collocations --------------------------------------------------

  /** Top-`k` adjacent-pair collocations by pointwise mutual
    * information: `pmi = ln(c₁₂·NU² / (NB·c₁·c₂))` (joint from the
    * bigram census, marginals from the unigram census), gated to
    * pairs with `c₁₂ ≥ minCount` — the multi-word-expression detector
    * a tokenizer-vocab builder runs. The raw double pmi differs
    * between engines in the last ulp (the >2⁵³ products round
    * differently), so the score lands on the q81 micro-grid
    * (⌊pmi·10⁶+0.5⌋ BIGINT) BEFORE ranking — ties break on (w1, w2).
    * Returns (w1, w2, c12, pmi_u).
    *
    * Censuses run in the HASH space (the q110 trigram-novelty
    * discipline): the token frame is tokenized ONCE and
    * localCheckpointed, the unigram census shuffles 8-byte
    * [[TextOps.tokenHash]] keys (min(w) carries the display string,
    * partial-agged to vocab size), and the bigram census shuffles
    * packed [[TextOps.bigramFpsOf]] fingerprints — never " "-joined
    * bigram strings. `fp div P` / `fp % P` (non-negative, so Spark
    * trunc-div == DuckDB floor-div) recover the two token hashes for
    * the marginal joins. Tokens colliding under the mod-P hash merge
    * their counts on BOTH engines — a corpus-wide constant shared
    * bit-exactly with the oracle, not a layout artifact — and the
    * lexicographically-smallest collided token is the representative.
    *
    * Scale shape: one scan+tokenize (checkpointed), two explode
    * passes over the materialized token arrays, two long-keyed
    * censuses (both partial-aggregable), hash-keyed marginal joins on
    * the vocab-sized frame, k-row TakeOrdered.
    */
  def pmiTopK(df: DataFrame, textCol: String, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    val P = TextOps.HashP
    val toks = df.select(TextOps.tokens(col(textCol)).as("__toks"))
      .localCheckpoint(true) // ONE scan+tokenize feeds both censuses
    val uniH = toks.select(explode(col("__toks")).as("w"))
      .groupBy(TextOps.tokenHash(col("w")).as("h"))
      .agg(count(lit(1)).as("c"), min(col("w")).as("w"))
      .localCheckpoint(true) // vocab-sized; feeds nu + both marginal joins
    val nu = uniH.agg(sum(col("c")).cast(DoubleType).as("nu"))
    val bcnt = toks
      .select(explode(TextOps.bigramFpsOf(col("__toks"))).as("bfp"))
      .groupBy("bfp").agg(count(lit(1)).as("c12"))
    val nb = bcnt.agg(sum(col("c12")).cast(DoubleType).as("nb"))
    val pmiU = floor(log(
      (col("c12").cast(DoubleType) * col("nu") * col("nu")) /
        (col("nb") * col("c1").cast(DoubleType) * col("c2").cast(DoubleType)))
      * lit(1000000.0) + lit(0.5)).cast(org.apache.spark.sql.types.LongType)
    bcnt.where(col("c12") >= minCount)
      .withColumn("h1", expr(s"bfp div ${P}L"))
      .withColumn("h2", col("bfp") % lit(P))
      .join(uniH.select(col("h").as("h1"), col("c").as("c1"),
        col("w").as("w1")), "h1")
      .join(uniH.select(col("h").as("h2"), col("c").as("c2"),
        col("w").as("w2")), "h2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("w1"), col("w2"), col("c12"), pmiU.as("pmi_u"))
      .orderBy(col("pmi_u").desc, col("w1"), col("w2"))
      .limit(k)
  }

  /** [[pmiTopK]] oracle rendering (hash-space censuses, mirroring the
    * Spark plan fingerprint-for-fingerprint).
    */
  def pmiTopKSql(table: String, textCol: String, minCount: Long = 5,
      k: Int = 50): String = {
    val P = TextOps.HashP
    s"""WITH toks AS (SELECT ${TextOps.tokensSql(textCol)} AS t FROM $table),
       |uh AS (SELECT ${TextOps.tokenHashSql("w")} AS h, count(*) AS c,
       |    min(w) AS w
       |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
       |nu AS (SELECT CAST(sum(c) AS DOUBLE) AS nu FROM uh),
       |th AS (SELECT ${TextOps.tokenHashesOfSql("t")} AS th FROM toks),
       |bcnt AS (SELECT bfp, count(*) AS c12
       |  FROM (SELECT unnest(${TextOps.bigramFpsOfSql("th")}) AS bfp FROM th)
       |  GROUP BY 1),
       |nb AS (SELECT CAST(sum(c12) AS DOUBLE) AS nb FROM bcnt)
       |SELECT u1.w AS w1, u2.w AS w2, c12,
       |  CAST(floor(ln((CAST(c12 AS DOUBLE) * nu * nu)
       |    / (nb * CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)))
       |    * 1000000.0 + 0.5) AS BIGINT) AS pmi_u
       |FROM bcnt
       |JOIN uh u1 ON bcnt.bfp // $P = u1.h
       |JOIN uh u2 ON bcnt.bfp % $P = u2.h
       |CROSS JOIN nu CROSS JOIN nb
       |WHERE c12 >= $minCount
       |ORDER BY pmi_u DESC, w1, w2 LIMIT $k""".stripMargin
  }

  /** [[sourceOverlap]] oracle rendering. */
  def sourceOverlapSql(table: String, srcCol: String, textCol: String): String =
    s"""WITH st AS (SELECT DISTINCT $srcCol AS s,
       |    unnest(${TextOps.tokensSql(textCol)}) AS tok FROM $table),
       |sizes AS (SELECT s, count(*) AS nv FROM st GROUP BY 1),
       |inter AS (SELECT a.s AS s1, b.s AS s2, count(*) AS inter
       |  FROM st a JOIN st b ON a.tok = b.tok AND a.s < b.s
       |  GROUP BY 1, 2)
       |SELECT s1, s2, CAST(inter AS BIGINT) AS inter,
       |  CAST(inter AS DOUBLE) / CAST(x.nv + y.nv - inter AS DOUBLE) AS jaccard
       |FROM inter JOIN sizes x ON s1 = x.s JOIN sizes y ON s2 = y.s
       |ORDER BY s1, s2""".stripMargin
}
