package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}
import graft.ops.{MultimodalOps, SimilarityOps, TextOps}

/** Round-13 first wave: exact pass@k evaluation (q308), Matryoshka
  * prefix-dimension distortion audit (q309), the TIFF container —
  * seventh format, first data-dependent BYTE ORDER (q310), the ustar
  * TAR entry header — eighth format, first ASCII-octal numbers and a
  * self-checksum (q311), and Kneser-Ney smoothed bigram probabilities
  * on the hashed-census machinery q116 built this round (q312).
  */
object Round13Queries {

  // -- q308: exact pass@k ----------------------------------------------------
  // The code-eval metric: per problem with n samples of which c pass,
  // pass@k = 1 − C(n−c,k)/C(n,k) — the unbiased estimator. The
  // binomial ratio telescopes to Π_{i<k} (n−c−i)/(n−i), evaluated as
  // a SEQUENTIAL trunc-div product on a 1e-9 grid: r ← r·max(n−c−i,0)
  // div (n−i), starting at 1e9. Each factor ≤ 1 keeps r ≤ 1e9, so the
  // intermediate r·(n−c−i) stays under 2⁶³ for any n ≤ 9e9 — exact
  // BIGINT at 100 TB with NO binomial ever materialized; the
  // truncation bias is < k ppb and IDENTICAL on both engines (same
  // expression, same grid — a defined semantic, not float noise).
  // Once a factor hits 0 (c > n−k), r collapses to 0 and pass@k = 1,
  // which is exactly C(n−c,k) = 0. Problems = users, samples =
  // events, "pass" = value > 100. One tiny (user → n, c) census
  // feeds all three k branches.
  private val PassKs = Seq(1, 5, 10)

  private def passRExpr(k: Int): String = {
    var r = "1000000000"
    for (i <- 0 until k)
      r = s"(($r * greatest(n - c - $i, 0)) div (n - $i))"
    r
  }

  private def q308(spark: SparkSession, sfDir: String): DataFrame = {
    val perUser = Tables.read(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") > 100, 1L).otherwise(0L)).as("c"))
      .localCheckpoint(true) // one census; three k branches read it
    PassKs.map { k =>
      perUser.where(col("n") >= k)
        .select(expr(s"1000000000 - ${passRExpr(k)}").as("p"))
        .agg(count(lit(1)).as("n_problems"),
          sum(col("p").cast(DecimalType(38, 0))).as("s"))
        .select(lit(k.toLong).as("k"), col("n_problems"),
          // NULL, not an error, when no problem has n >= k (CASE
          // short-circuits the ANSI div-by-zero on both engines)
          expr("CASE WHEN n_problems > 0 THEN CAST(s div n_problems" +
            " AS BIGINT) END").as("mean_pass_ppb"))
    }.reduce(_ unionAll _).orderBy("k")
  }

  private val q308Oracle: String = {
    def r(k: Int): String = {
      var e = "1000000000"
      for (i <- 0 until k)
        e = s"(($e * greatest(n - c - $i, 0)) // (n - $i))"
      e
    }
    val branches = PassKs.map { k =>
      s"""SELECT CAST($k AS BIGINT) AS k, count(*) AS n_problems,
         |  CASE WHEN count(*) > 0
         |    THEN CAST(sum(p) // count(*) AS BIGINT) END AS mean_pass_ppb
         |FROM (SELECT 1000000000 - ${r(k)} AS p FROM pu WHERE n >= $k)"""
        .stripMargin
    }
    s"""WITH pu AS (SELECT user_id, count(*) AS n,
       |    count(*) FILTER (WHERE value > 100) AS c
       |  FROM events GROUP BY 1)
       |${branches.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY k""".stripMargin
  }

  // -- q309: Matryoshka prefix-dimension distortion ---------------------------
  // MRL-style embeddings promise that the FIRST d dimensions are a
  // usable small embedding; before serving truncated vectors, audit
  // how much cosine structure each prefix keeps. Pair spine: vector i
  // joins vector i + (max+1)/2 — an equi join that scales as one
  // shuffle, no quadratic fan-out. Per prefix d ∈ {8,16,32}:
  // |cos_d − cos_full| on the 1e-6 grid (kernel dot products run
  // left-to-right exactly like the oracle's list_sum, so the doubles
  // match bit-for-bit BEFORE gridding — the q22 parity class).
  private val MatDims = Seq(8, 16, 32)

  private def q309(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val off = emb.agg(expr("(max(vec_id) + 1) div 2").as("off"))
    val pairs = emb.crossJoin(broadcast(off))
      .select(col("v").as("va"), (col("vec_id") + col("off")).as("bid"))
      .join(emb.select(col("vec_id").as("bid"), col("v").as("vb")), "bid")
      .select(col("va"), col("vb"))
      .localCheckpoint(true) // spine-sized; three prefix branches
    def deltaU(d: Int): Column =
      floor(abs(SimilarityOps.cosine(slice(col("va"), 1, d),
          slice(col("vb"), 1, d)) -
        SimilarityOps.cosine(col("va"), col("vb"))) * lit(1000000) +
        lit(0.5)).cast(LongType)
    MatDims.map { d =>
      pairs.select(deltaU(d).as("delta_u"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("delta_u")).as("s"),
          max(col("delta_u")).as("max_delta_u"))
        .select(lit(d.toLong).as("prefix_dim"), col("n_pairs"),
          expr("s div n_pairs").as("mean_delta_u"), col("max_delta_u"))
    }.reduce(_ unionAll _).orderBy("prefix_dim")
  }

  private val q309Oracle: String = {
    def cosD(d: Int): String =
      SimilarityOps.cosineSql(s"(va)[1:$d]", s"(vb)[1:$d]")
    val cosFull = SimilarityOps.cosineSql("va", "vb")
    val branches = MatDims.map { d =>
      s"""SELECT CAST($d AS BIGINT) AS prefix_dim, count(*) AS n_pairs,
         |  CAST(CAST(sum(delta_u) AS HUGEINT) // count(*) AS BIGINT)
         |    AS mean_delta_u,
         |  max(delta_u) AS max_delta_u
         |FROM (SELECT CAST(floor(abs(${cosD(d)} - $cosFull) * 1000000
         |    + 0.5) AS BIGINT) AS delta_u FROM p)""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |o AS (SELECT (max(vec_id) + 1) // 2 AS off FROM e),
       |p AS (SELECT a.v AS va, b.v AS vb
       |  FROM e a, o, e b WHERE b.vec_id = a.vec_id + o.off)
       |${branches.mkString("", "\nUNION ALL\n", "")}
       |ORDER BY prefix_dim""".stripMargin
  }

  // -- q310: TIFF metadata roundtrip ------------------------------------------
  // Seventh container; what's NEW vs PNG/WAV/JPEG/MP4/BMP/GIF is that
  // the byte order is DATA — "II" vs "MM" in the header decides how
  // every later u16/u32 decodes, and the fixture exercises BOTH
  // (doc_id parity). Every 7th payload carries magic 43 and must come
  // back NULL; the oracle recomputes the fields algebraically from
  // the same doc columns (the q306 discipline — byte-level parse
  // fidelity is pinned by spec-literal units, not by the oracle).
  private def q310(spark: SparkSession, sfDir: String): DataFrame = {
    val payload = MultimodalOps.tiffHeader(
      col("n_chars") % 50000 + 1, col("doc_id") % 30000 + 1,
      col("doc_id") % 2 === 0, col("doc_id") % 7 =!= 0)
    val meta = MultimodalOps.tiffMeta(col("payload"))
    Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"), meta.as("__m"))
      .select(col("doc_id"),
        col("__m").getItem(0).as("width"),
        col("__m").getItem(1).as("height"),
        col("__m").getItem(2).as("big_endian"),
        col("__m").getItem(3).as("n_entries"))
      .orderBy("doc_id")
  }

  private val q310Oracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 7 <> 0 THEN n_chars % 50000 + 1 END AS width,
      |  CASE WHEN doc_id % 7 <> 0 THEN doc_id % 30000 + 1 END AS height,
      |  CASE WHEN doc_id % 7 <> 0
      |    THEN CAST(doc_id % 2 = 0 AS BIGINT) END AS big_endian,
      |  CASE WHEN doc_id % 7 <> 0 THEN CAST(2 AS BIGINT) END AS n_entries
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q311: TAR (ustar) entry catalog ----------------------------------------
  // Eighth container; what's NEW is numbers as ASCII OCTAL fields and
  // a checksum whose own field is summed as spaces — the parser
  // VERIFIES that checksum, and every 5th payload ships with it off
  // by one (the bit-rot case a tar catalog pass must reject). Fields
  // recomputed algebraically by the oracle as usual.
  private def q311(spark: SparkSession, sfDir: String): DataFrame = {
    val payload = MultimodalOps.tarHeader(
      concat(lit("doc_"), col("doc_id").cast("string"), lit(".txt")),
      col("n_chars"), lit(1700000000L) + col("doc_id"), lit(0),
      col("doc_id") % 5 =!= 3)
    Tables.read(spark, sfDir, "documents")
      .select(col("doc_id"), payload.as("payload"))
      .select(col("doc_id"), MultimodalOps.tarName(col("payload")).as("name"),
        MultimodalOps.tarMeta(col("payload")).as("__m"))
      .select(col("doc_id"), col("name"),
        col("__m").getItem(0).as("size"),
        col("__m").getItem(1).as("mtime"),
        col("__m").getItem(2).as("typeflag"))
      .orderBy("doc_id")
  }

  private val q311Oracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 5 <> 3
      |    THEN 'doc_' || doc_id || '.txt' END AS name,
      |  CASE WHEN doc_id % 5 <> 3 THEN n_chars END AS size,
      |  CASE WHEN doc_id % 5 <> 3 THEN 1700000000 + doc_id END AS mtime,
      |  CASE WHEN doc_id % 5 <> 3 THEN CAST(0 AS BIGINT) END AS typeflag
      |FROM documents ORDER BY doc_id""".stripMargin

  // -- q312: Kneser-Ney smoothed bigram probabilities --------------------------
  // The LM-quality collocation ranking PMI (q116) and G² (q294) lack:
  // absolute discounting with CONTINUATION-count backoff —
  // P_KN(w2|w1) = (c12 − d)/c1 + d·N1L(w1)/c1 · N1R(w2)/B with the
  // textbook d = 0.75 = 3/4, which keeps EVERYTHING rational:
  //   term1 = (4·c12 − 3)·1e9 div (4·c1)
  //   term2 = 3·N1L·N1R·1e9 div (4·c1·B)
  // — DECIMAL(38)/HUGEINT products, both terms landed on the ppb grid
  // and integer-summed (no IEEE anywhere). c1 is the CONTEXT mass
  // Σ_w2 c12 (not the unigram count — last tokens of a doc have no
  // continuation), so every statistic derives from ONE bigram census
  // over packed fingerprints (the q116 machinery); display strings
  // come from the hash-keyed unigram census.
  private val KnMinCtx = 20L
  private val KnMinC12 = 3L
  private val KnK = 50

  private def q312(spark: SparkSession, sfDir: String): DataFrame = {
    val P = TextOps.HashP
    val toks = Tables.read(spark, sfDir, "documents")
      .select(TextOps.tokens(col("text")).as("__toks"))
      .localCheckpoint(true)
    val uniH = toks.select(explode(col("__toks")).as("w"))
      .groupBy(TextOps.tokenHash(col("w")).as("h"))
      .agg(min(col("w")).as("w"))
      .localCheckpoint(true) // display strings for both sides
    val bcnt = toks
      .select(explode(TextOps.bigramFpsOf(col("__toks"))).as("bfp"))
      .groupBy("bfp").agg(count(lit(1)).as("c12"))
      .withColumn("h1", expr(s"bfp div ${P}L"))
      .withColumn("h2", col("bfp") % lit(P))
      .localCheckpoint(true) // feeds ctx, cont, B and the final scan
    val ctx = bcnt.groupBy("h1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1l"))
    val cont = bcnt.groupBy("h2").agg(count(lit(1)).as("n1r"))
    val b = bcnt.agg(count(lit(1)).as("bt"))
    bcnt.where(col("c12") >= KnMinC12)
      .join(ctx, "h1").where(col("c1") >= KnMinCtx)
      .join(cont, "h2")
      .crossJoin(broadcast(b))
      .select(col("h1"), col("h2"), col("c12"),
        (expr("CAST(((CAST(c12 AS DECIMAL(38,0)) * 4 - 3) * 1000000000)" +
            " div (CAST(c1 AS DECIMAL(38,0)) * 4) AS BIGINT)") +
          expr("CAST((CAST(n1l AS DECIMAL(38,0)) * n1r * 3 * 1000000000)" +
            " div (CAST(c1 AS DECIMAL(38,0)) * 4 * bt) AS BIGINT)"))
          .as("p_kn_ppb"))
      .join(uniH.select(col("h").as("h1"), col("w").as("w1")), "h1")
      .join(uniH.select(col("h").as("h2"), col("w").as("w2")), "h2")
      .select(col("w1"), col("w2"), col("c12"), col("p_kn_ppb"))
      .orderBy(col("p_kn_ppb").desc, col("w1"), col("w2"))
      .limit(KnK)
  }

  private val q312Oracle: String = {
    val P = TextOps.HashP
    s"""WITH toks AS (SELECT ${TextOps.tokensSql("text")} AS t FROM documents),
       |uh AS (SELECT ${TextOps.tokenHashSql("w")} AS h, min(w) AS w
       |  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY 1),
       |th AS (SELECT ${TextOps.tokenHashesOfSql("t")} AS th FROM toks),
       |bcnt AS (SELECT bfp // $P AS h1, bfp % $P AS h2, count(*) AS c12
       |  FROM (SELECT unnest(${TextOps.bigramFpsOfSql("th")}) AS bfp FROM th)
       |  GROUP BY 1, 2),
       |ctx AS (SELECT h1, CAST(sum(c12) AS BIGINT) AS c1,
       |    count(*) AS n1l FROM bcnt GROUP BY 1),
       |cont AS (SELECT h2, count(*) AS n1r FROM bcnt GROUP BY 1),
       |b AS (SELECT count(*) AS bt FROM bcnt)
       |SELECT u1.w AS w1, u2.w AS w2, c12,
       |  CAST((CAST(c12 AS HUGEINT) * 4 - 3) * 1000000000
       |      // (CAST(c1 AS HUGEINT) * 4) AS BIGINT)
       |  + CAST(CAST(n1l AS HUGEINT) * n1r * 3 * 1000000000
       |      // (CAST(c1 AS HUGEINT) * 4 * bt) AS BIGINT) AS p_kn_ppb
       |FROM bcnt
       |JOIN ctx USING (h1) JOIN cont USING (h2) CROSS JOIN b
       |JOIN uh u1 ON bcnt.h1 = u1.h
       |JOIN uh u2 ON bcnt.h2 = u2.h
       |WHERE c12 >= $KnMinC12 AND c1 >= $KnMinCtx
       |ORDER BY p_kn_ppb DESC, w1, w2 LIMIT $KnK""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q308_pass_at_k", q308, Some(q308Oracle)),
    QueryDef("q309_matryoshka_audit", q309, Some(q309Oracle)),
    QueryDef("q310_tiff_metadata", q310, Some(q310Oracle)),
    QueryDef("q311_tar_catalog", q311, Some(q311Oracle)),
    QueryDef("q312_kneser_ney", q312, Some(q312Oracle)),
  )
}
