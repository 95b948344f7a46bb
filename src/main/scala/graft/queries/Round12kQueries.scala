package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops._

/** Round-12 eleventh wave: MMR diversified re-ranking (the
  * relevance/redundancy trade-off step every retrieval stack runs on
  * its candidate set) and the near-dup threshold-sensitivity sweep
  * (the curve an engineer reads before picking q20's Jaccard cut).
  */
object Round12kQueries {

  // -- q277: maximal-marginal-relevance re-ranking --------------------------------
  // Greedy MMR over the exact cosine top-20 of query vec 0: each round
  // picks argmax λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s) (λ = 0.7),
  // scores on a 1e-6 integer grid with id tiebreaks. Scale shape: the
  // DISTRIBUTED part is the corpus-sized top-k scan; MMR re-ranks the
  // bounded candidate set (20 rows, 20² sims) — inherently a
  // driver-sized step, the same bounded-collect class as the k-means
  // centroid loop. The oracle replays all five greedy rounds as
  // unrolled CTEs over the identical n4 cosine grid.
  private val MmrQueryId = 0L
  private val MmrCand = 20
  private val MmrPicks = 5
  private val MmrLambda = 0.7

  private def n4d(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000

  private def q277(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
    val top = SimilarityOps.bruteForceTopK(emb,
        emb.where(col("vec_id") === MmrQueryId), MmrCand)
      .select(col("vec_id"), col("cos").as("rel"))
      .join(emb.select(col("vec_id"),
        col("embedding").cast(ArrayType(DoubleType)).as("v")), "vec_id")
    // bounded collect: ≤ MmrCand candidate rows (the k-means class)
    val cand = top.collect().map(r => (r.getLong(0), r.getDouble(1),
      r.getSeq[Double](2).toArray)).sortBy(_._1)
    def seqDot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      n4d(seqDot(a, b) / (math.sqrt(seqDot(a, a)) * math.sqrt(seqDot(b, b))))
    val sim = (for {
      (ia, _, va) <- cand; (ib, _, vb) <- cand if ia != ib
    } yield (ia, ib) -> cos(va, vb)).toMap
    var selected = Vector.empty[(Int, Long, Double, Double, Long)]
    var remaining = cand.map { case (id, rel, _) => (id, rel) }.toVector
    for (p <- 1 to MmrPicks if remaining.nonEmpty) {
      val scored = remaining.map { case (id, rel) =>
        val ms = if (selected.isEmpty) 0.0
          else selected.map(s => sim((id, s._2))).max
        val scoreU = math.floor((MmrLambda * rel - (1 - MmrLambda) * ms)
          * 1000000.0 + 0.5).toLong
        (id, rel, ms, scoreU)
      }
      val pick = scored.minBy { case (id, _, _, s) => (-s, id) }
      selected :+= ((p, pick._1, pick._2, pick._3, pick._4))
      remaining = remaining.filterNot(_._1 == pick._1)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(selected.map(Row.fromTuple), 1),
      StructType(Seq(
        StructField("pick", IntegerType, nullable = false),
        StructField("vec_id", LongType, nullable = false),
        StructField("rel", DoubleType, nullable = false),
        StructField("maxsim", DoubleType, nullable = false),
        StructField("score_u", LongType, nullable = false))))
      .orderBy("pick")
  }

  private val q277Oracle: String = {
    import OracleHelpers.n4
    val lam = s"CAST($MmrLambda AS DOUBLE)"
    val oneMinus = s"CAST(${1 - MmrLambda} AS DOUBLE)"
    def scoreU(rel: String, ms: String) =
      s"CAST(floor(($lam * $rel - $oneMinus * $ms) * 1000000.0 + 0.5) AS BIGINT)"
    val rounds = (2 to MmrPicks).map { p =>
      s"""p$p AS (SELECT $p AS pick, vec_id, rel, ms AS maxsim,
         |    ${scoreU("rel", "ms")} AS score_u
         |  FROM (SELECT t.vec_id, t.rel, max(s.s) AS ms
         |        FROM top t JOIN sim s ON s.ia = t.vec_id
         |          AND s.ib IN (SELECT vec_id FROM sel${p - 1})
         |        WHERE t.vec_id NOT IN (SELECT vec_id FROM sel${p - 1})
         |        GROUP BY t.vec_id, t.rel)
         |  ORDER BY score_u DESC, vec_id LIMIT 1),
         |sel$p AS (SELECT * FROM sel${p - 1} UNION ALL SELECT * FROM p$p)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH c AS (SELECT vec_id,
       |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v AS qv FROM c WHERE vec_id = $MmrQueryId),
       |scored AS (SELECT vec_id, v,
       |    ${n4(SimilarityOps.cosineSql("qv", "v"))} AS rel
       |  FROM c, q WHERE vec_id != $MmrQueryId),
       |top AS (SELECT vec_id, v, rel FROM scored
       |        ORDER BY rel DESC, vec_id LIMIT $MmrCand),
       |sim AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    ${n4(SimilarityOps.cosineSql("a.v", "b.v"))} AS s
       |  FROM top a, top b WHERE a.vec_id <> b.vec_id),
       |p1 AS (SELECT 1 AS pick, vec_id, rel, CAST(0.0 AS DOUBLE) AS maxsim,
       |    ${scoreU("rel", "CAST(0.0 AS DOUBLE)")} AS score_u
       |  FROM top ORDER BY ${scoreU("rel", "CAST(0.0 AS DOUBLE)")} DESC,
       |    vec_id LIMIT 1),
       |sel1 AS (SELECT * FROM p1),
       |$rounds
       |SELECT CAST(pick AS INTEGER) AS pick, vec_id, rel, maxsim, score_u
       |FROM sel$MmrPicks ORDER BY pick""".stripMargin
  }

  // -- q278: near-dup Jaccard threshold-sensitivity sweep ---------------------------
  // q20's LSH candidate pairs verified at threshold ZERO, bucketed
  // into Jaccard deciles on a dense 0-9 spine (empty buckets surface
  // as 0 — the q188 lesson), plus the survival curve "pairs kept if
  // the cut were b/10" an engineer reads to pick the dedup threshold.
  // Scale shape: identical to q20 (banded candidates, ONE band-keyed
  // shuffle, per-pair set Jaccard); the census and the ≤10-row
  // survival window are aggregate-sized.
  private def q278(spark: SparkSession, sfDir: String): DataFrame = {
    val pairs = DedupOps.nearDupPairs(
      ExtQueries.nearDupCorpus(spark, sfDir), "doc_id", "text",
      ExtQueries.MinHashes, ExtQueries.Bands, threshold = 0.0)
    val census = pairs
      .select(least(floor(col("jac") * 10).cast(LongType), lit(9L))
        .as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n"))
    spark.range(0, 10).select(col("id").as("bucket"))
      .join(census, Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("n"), lit(0L)).as("n_pairs"))
      .withColumn("pairs_at_or_above",
        sum(col("n_pairs")).over(Window.orderBy(col("bucket").desc)
          .rowsBetween(Window.unboundedPreceding, 0)))
      .orderBy("bucket")
  }

  private val q278Oracle: String = {
    import OracleHelpers.n4
    val r = ExtQueries.MinHashes / ExtQueries.Bands
    s"""WITH corpus AS (${ExtQueries.nearDupCorpusSql}),
       |hs AS (SELECT id, ${DedupOps.shingleHashesSql("text")} AS h FROM corpus),
       |sigs AS (SELECT id, h,
       |    ${DedupOps.minhashSignatureSql("h", ExtQueries.MinHashes)} AS sig
       |  FROM hs WHERE len(h) > 0),
       |bands AS (SELECT id,
       |    unnest(${DedupOps.bandKeysSql("sig", ExtQueries.Bands, r)}) AS band
       |  FROM sigs),
       |cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |         FROM bands a JOIN bands b ON a.band = b.band AND a.id < b.id),
       |verified AS (SELECT id_a, id_b,
       |    ${n4(DedupOps.jaccardSql("ha.h", "hb.h"))} AS jac
       |  FROM cand JOIN sigs ha ON cand.id_a = ha.id
       |  JOIN sigs hb ON cand.id_b = hb.id),
       |census AS (SELECT least(CAST(floor(jac * 10) AS BIGINT), 9) AS bucket,
       |    count(*) AS n FROM verified GROUP BY 1),
       |spine AS (SELECT CAST(range AS BIGINT) AS bucket FROM range(0, 10))
       |SELECT s.bucket, CAST(coalesce(n, 0) AS BIGINT) AS n_pairs,
       |  CAST(sum(coalesce(n, 0)) OVER (ORDER BY s.bucket DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS pairs_at_or_above
       |FROM spine s LEFT JOIN census ON census.bucket = s.bucket
       |ORDER BY s.bucket""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q277_mmr_rerank", q277, Some(q277Oracle)),
    QueryDef("q278_jaccard_sweep", q278, Some(q278Oracle)))
}
