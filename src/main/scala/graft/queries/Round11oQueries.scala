package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

import graft.ops.{SimilarityOps, TextOps}

/** Round-11 fifteenth wave: the TPC-H Q5 six-table join-planning
  * showcase, the exact Kruskal-Wallis k-group rank test, IVF-PQ
  * asymmetric-distance search, and reciprocal-rank fusion.
  */
object Round11oQueries {

  // -- q229: TPC-H Q5 (regional supplier revenue) ----------------------------
  // The canonical 6-table join (region → nation → supplier/customer →
  // orders → lineitem, with the "supplier serves a customer of its
  // own nation" non-key condition) — the join-ORDER showcase q170's
  // 3-table Q3 can't express. The scale-shaped plan builds the dim
  // chain region→nation→supplier FIRST (broadcast joins over frames
  // that shrink 5× at the region filter), so lineitem is cut to
  // in-region suppliers map-side BEFORE the one data-sized shuffle
  // (lineitem ⋈ year-filtered orders on the order key). The customer
  // side then attaches per-order with the nation-match condition in
  // the join predicate. customer/supplier broadcast at fixture scale;
  // at a 100 TB SF a cost-based planner (or AQE) flips exactly those
  // two to shuffles and the shape still holds — the dim-first
  // reduction and the single fact-fact shuffle are the invariants.
  // Revenue folds on q170's exact integer grid:
  // cents × (100 − discount-cents), order-independent.
  private val Q5Region = "ASIA"
  private val Q5Start = "1996-01-01"
  private val Q5End = "1997-01-01"

  private def q229(spark: SparkSession, sfDir: String): DataFrame = {
    val rnation = Tables.read(spark, sfDir, "nation")
      .join(broadcast(Tables.read(spark, sfDir, "region")
          .where(col("r_name") === Q5Region)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = Tables.read(spark, sfDir, "supplier")
      .join(broadcast(rnation), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = Tables.read(spark, sfDir, "orders")
      .where(to_date(col("o_orderdate")) >= lit(Q5Start).cast("date") &&
        to_date(col("o_orderdate")) < lit(Q5End).cast("date"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.read(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType) *
          (lit(100L) - floor(col("l_discount") * 100 + lit(0.5)).cast(LongType)))
          .as("rev_u"))
    li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.read(spark, sfDir, "customer")
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev_u")).as("revenue_u"))
      .orderBy(col("revenue_u").desc, col("n_name"))
  }

  private val q229Oracle: String =
    s"""SELECT n_name,
       |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
       |    AS revenue_u
       |FROM region
       |JOIN nation ON n_regionkey = r_regionkey
       |JOIN supplier ON s_nationkey = n_nationkey
       |JOIN lineitem ON l_suppkey = s_suppkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
       |WHERE r_name = '$Q5Region'
       |  AND CAST(o_orderdate AS DATE) >= DATE '$Q5Start'
       |  AND CAST(o_orderdate AS DATE) < DATE '$Q5End'
       |GROUP BY 1
       |ORDER BY revenue_u DESC, n_name""".stripMargin

  // -- q231: Kruskal-Wallis H test -------------------------------------------
  // The k-group generalization of q223's Mann-Whitney (one-way ANOVA
  // on ranks, no normality assumption): groups = the 5 order
  // priorities, metric = floor(o_totalprice). Same scale skeleton as
  // q223 — the raw metric collapses to a (value, group) census, the
  // mid-rank prefix is decomposed over percentile-cut buckets with a
  // 32-row carry frame (exact for any cut placement), and every rank
  // sum stays integer: 2·R_g = Σ_v n_gv·(2·cum_<v + t_v + 1).
  //
  // Cross-engine determinism for H (a sum of per-group double terms —
  // order-private in IEEE): each group's term
  // 12·R_g²/(N(N+1)·n_g) = 3·(2R_g)²/(N(N+1)·n_g) is computed as ONE
  // fixed double expression from exact integers and floored onto the
  // 1e-6 grid, then the ≤5 terms integer-sum (the q116/q137 grid
  // pattern) — h_u is bit-exact on both engines. The tie-corrected
  // H' = H/(1 − ΣT/(N³−N)) reuses the exact tie moment.
  private val KwBuckets = 32

  private def q231(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val census = Tables.read(spark, sfDir, "orders")
      .select(floor(col("o_totalprice")).as("x"),
        col("o_orderpriority").as("g"))
      .groupBy("x", "g").agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // feeds value totals + cuts + contributions
    val totals = census.groupBy("x").agg(sum(col("n")).as("t"))
      .localCheckpoint(true)
    val fracs = (1 until KwBuckets).map(_.toDouble / KwBuckets)
    // SKETCH cuts (round 12, the q223 note): bucket placement needs
    // no exactness, so the exact percentile's value map is dead cost
    val cuts = totals.agg(percentile_approx(col("x"),
      array(fracs.map(lit): _*), lit(10000)).as("__cuts"))
    val bucketed = totals.crossJoin(broadcast(cuts))
      .withColumn("__bkt", (1 until KwBuckets).foldLeft(lit(1)) {
        case (acc, i) =>
          acc + when(col("x").cast(DoubleType) >
            element_at(col("__cuts"), i), 1).otherwise(0)
      })
      .drop("__cuts")
      .localCheckpoint(true)
    val carries = bucketed.groupBy("__bkt").agg(sum(col("t")).as("__bsum"))
      .withColumn("__carry",
        coalesce(sum(col("__bsum")).over(
          Window.orderBy("__bkt")
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__bkt"), col("__carry"))
    val w = Window.partitionBy("__bkt").orderBy(col("x").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = bucketed.join(broadcast(carries), "__bkt")
      .withColumn("__cum",
        col("__carry") + coalesce(sum(col("t")).over(w), lit(0L)))
      .select(col("x"), col("t"), col("__cum"))
    val perGroup = census.join(ranked, "x")
      .groupBy("g")
      .agg(sum(col("n")).as("n_g"),
        sum(col("n").cast(dec) *
          (lit(2L) * col("__cum") + col("t") + lit(1L)).cast(dec)).as("__r2"))
    val moments = ranked.agg(sum(col("t")).cast(dec).as("__nn"),
      sum(col("t").cast(dec) * col("t").cast(dec) * col("t").cast(dec)
        - col("t").cast(dec)).as("__ties"))
    val terms = perGroup.crossJoin(broadcast(moments))
      .select(col("g"), col("n_g"), col("__r2").cast(LongType).as("r2"),
        col("__nn"), col("__ties"),
        floor(lit(3.0) *
          col("__r2").cast(DoubleType) * col("__r2").cast(DoubleType) /
          ((col("__nn") * (col("__nn") + lit(1))).cast(DoubleType) *
            col("n_g").cast(DoubleType)) * lit(1000000.0) + lit(0.5))
          .cast(LongType).as("term_u"))
    val h = terms.agg(sum(col("term_u")).as("__sum_u"),
        first(col("__nn")).as("__nn"), first(col("__ties")).as("__ties"))
      .select(
        (col("__sum_u") - lit(3000000L) * (col("__nn") + lit(1)).cast(LongType))
          .as("h_u"),
        col("__nn"), col("__ties"))
      .select(col("h_u"),
        Norm.n4((col("h_u").cast(DoubleType) / lit(1000000.0)) /
          (lit(1.0) - col("__ties").cast(DoubleType) /
            (col("__nn") * col("__nn") * col("__nn") - col("__nn"))
              .cast(DoubleType))).as("h_tie_n4"))
    terms.select(col("g"), col("n_g"), col("r2"), col("term_u"))
      .crossJoin(broadcast(h))
      .orderBy("g")
  }

  private val q231Oracle: String =
    s"""WITH b AS (SELECT CAST(floor(o_totalprice) AS BIGINT) AS x,
       |    o_orderpriority AS g
       |  FROM orders),
       |census AS (SELECT x, g, count(*) AS n FROM b GROUP BY 1, 2),
       |totals AS (SELECT x, CAST(sum(n) AS BIGINT) AS t
       |  FROM census GROUP BY 1),
       |ranked AS (SELECT x, t,
       |    CAST(coalesce(sum(t) OVER (ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS cum
       |  FROM totals),
       |pg AS (SELECT g, CAST(sum(n) AS BIGINT) AS n_g,
       |    sum(CAST(n AS HUGEINT) * (2 * cum + t + 1)) AS r2
       |  FROM census JOIN ranked USING (x) GROUP BY 1),
       |mo AS (SELECT CAST(sum(t) AS HUGEINT) AS nn,
       |    sum(CAST(t AS HUGEINT) * t * t - t) AS ties
       |  FROM ranked),
       |terms AS (SELECT g, n_g, CAST(r2 AS BIGINT) AS r2, nn, ties,
       |    CAST(floor(3.0 * CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
       |      / (CAST(nn * (nn + 1) AS DOUBLE) * CAST(n_g AS DOUBLE))
       |      * 1000000.0 + 0.5) AS BIGINT) AS term_u
       |  FROM pg CROSS JOIN mo),
       |h AS (SELECT
       |    CAST(sum(term_u) - 3000000 * (any_value(nn) + 1) AS BIGINT) AS h_u,
       |    any_value(nn) AS nn, any_value(ties) AS ties
       |  FROM terms)
       |SELECT g, n_g, r2, term_u, h_u,
       |  ${graft.etl.OracleSql.n4(
      "(CAST(h_u AS DOUBLE) / 1000000.0) / (1.0 - CAST(h.ties AS DOUBLE) " +
        "/ CAST(h.nn * h.nn * h.nn - h.nn AS DOUBLE))")} AS h_tie_n4
       |FROM terms CROSS JOIN h
       |ORDER BY g""".stripMargin

  // -- q230: IVF-PQ asymmetric-distance search -------------------------------
  // The full vector-search-at-scale composition the q49 (IVF) and
  // q212 (PQ codebook) pieces exist for — the FAISS IVF-PQ shape,
  // nprobe=1: a 4-cell coarse quantizer routes each query to one
  // inverted list; within it, distances are read from the PQ codes
  // alone (2 subspaces × 4 cells), never the raw vectors. The
  // reconstruction codebook is the Lloyd-optimal per-cell mean ON THE
  // 1e-6 INTEGER GRID (sum of micro-units div count — deterministic
  // cross-engine, unlike an IEEE avg), the per-query lookup tables
  // are 8 integers each (probes × subspaces × cells, broadcast), and
  // the ADC distance is two LUT reads summed — the scan never touches
  // an embedding. Exact squared distance rides along on the ≤24
  // retrieved pairs (bounded, q154-style) so the quantization error
  // is visible in the result. Probes are a fixed bounded eval set;
  // the per-probe rank window partitions on query_id over one
  // inverted list, not the corpus.
  private val PqK = 4
  private val PqIters = 2
  private val AdcProbes = 8
  private val AdcTopK = 3

  private def q230(spark: SparkSession, sfDir: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val emb = Tables.read(spark, sfDir, "embeddings")
    def sub(from: Int) = emb.select(col("vec_id"),
      slice(col("embedding"), from, 32).as("embedding"))
    val lo = SimilarityOps.kmeansAssign(sub(1), PqK, PqIters)
      .withColumnRenamed("cell", "c_lo")
    val hi = SimilarityOps.kmeansAssign(sub(33), PqK, PqIters)
      .withColumnRenamed("cell", "c_hi")
    val cg = SimilarityOps.kmeansAssign(emb, PqK, PqIters)
      .withColumnRenamed("cell", "ccell")
    // the compressed index: 2×2-bit code + coarse cell per vector
    val codes = lo.join(hi, "vec_id").join(cg, "vec_id")
      .localCheckpoint(true)
    def coords(from: Int, subName: String) = emb
      .select(col("vec_id"), posexplode(slice(col("embedding"), from, 32))
        .as(Seq("dim", "x")))
      .select(col("vec_id"), lit(subName).as("sub"), col("dim"),
        floor(col("x").cast(DoubleType) * 1000000 + lit(0.5))
          .cast(LongType).as("x_u"))
    val allCoords = coords(1, "lo").unionByName(coords(33, "hi"))
      .localCheckpoint(true) // feeds recon + probes + the exact check
    val recon = allCoords.join(codes, "vec_id")
      .select(col("sub"),
        when(col("sub") === "lo", col("c_lo")).otherwise(col("c_hi"))
          .as("cell"),
        col("dim"), col("x_u"))
      .groupBy("sub", "cell", "dim")
      .agg(sum(col("x_u")).as("s_u"), count(lit(1)).as("n"))
      .select(col("sub"), col("cell"), col("dim"),
        expr("s_u div n").as("m_u"))
    val probes = allCoords.where(col("vec_id") < AdcProbes)
      .select(col("vec_id").as("query_id"), col("sub"), col("dim"),
        col("x_u").as("q_u"))
      .localCheckpoint(true)
    val lut = probes.join(broadcast(recon), Seq("sub", "dim"))
      .groupBy("query_id", "sub", "cell")
      .agg(sum((col("q_u") - col("m_u")).cast(dec) *
        (col("q_u") - col("m_u")).cast(dec)).as("d"))
      .localCheckpoint(true)
    val probeCells = codes.where(col("vec_id") < AdcProbes)
      .select(col("vec_id").as("query_id"), col("ccell"))
    val cand = codes.join(broadcast(probeCells), Seq("ccell"))
      .where(col("vec_id") =!= col("query_id"))
    val lutLo = lut.where(col("sub") === "lo")
      .select(col("query_id"), col("cell").as("c_lo"), col("d").as("d_lo"))
    val lutHi = lut.where(col("sub") === "hi")
      .select(col("query_id"), col("cell").as("c_hi"), col("d").as("d_hi"))
    val adc = cand.join(broadcast(lutLo), Seq("query_id", "c_lo"))
      .join(broadcast(lutHi), Seq("query_id", "c_hi"))
      .select(col("query_id"), col("vec_id"),
        (col("d_lo") + col("d_hi")).cast(LongType).as("adc_u"))
    val wr = Window.partitionBy("query_id")
      .orderBy(col("adc_u").asc, col("vec_id").asc)
    val top = adc.withColumn("rank", row_number().over(wr))
      .where(col("rank") <= AdcTopK)
      .localCheckpoint(true) // ≤ probes×k rows — broadcast below
    allCoords.join(broadcast(top), "vec_id")
      .join(broadcast(probes), Seq("query_id", "sub", "dim"))
      .groupBy("query_id", "rank", "vec_id", "adc_u")
      .agg(sum((col("q_u") - col("x_u")).cast(dec) *
          (col("q_u") - col("x_u")).cast(dec)).cast(LongType).as("exact_u"))
      .select(col("query_id"), col("rank").cast(LongType).as("rank"),
        col("vec_id"), col("adc_u"), col("exact_u"))
      .orderBy("query_id", "rank")
  }

  private val q230Oracle: String = {
    def sub(lo: Int, hi: Int) =
      s"(SELECT vec_id, embedding[$lo:$hi] AS embedding FROM embeddings)"
    s"""WITH codes AS (
       |  SELECT lo.vec_id, lo.cell AS c_lo, hi.cell AS c_hi, cg.cell AS ccell
       |  FROM (${SimilarityOps.kmeansSql(sub(1, 32), PqK, PqIters)}) lo
       |  JOIN (${SimilarityOps.kmeansSql(sub(33, 64), PqK, PqIters)}) hi
       |    USING (vec_id)
       |  JOIN (${SimilarityOps.kmeansSql("embeddings", PqK, PqIters)}) cg
       |    USING (vec_id)),
       |coords AS (
       |  SELECT vec_id, sb.s AS sub, CAST(d.i - 1 AS INTEGER) AS dim,
       |    CAST(floor(CAST(CASE WHEN sb.s = 'lo' THEN embedding[CAST(d.i AS INTEGER)]
       |        ELSE embedding[CAST(d.i + 32 AS INTEGER)] END AS DOUBLE)
       |      * 1000000 + 0.5) AS BIGINT) AS x_u
       |  FROM embeddings, (SELECT unnest(['lo', 'hi']) AS s) sb,
       |    (SELECT unnest(range(1, 33)) AS i) d),
       |recon AS (
       |  SELECT sub, cell, dim, CAST(sum(x_u) // count(*) AS BIGINT) AS m_u
       |  FROM (SELECT c.sub,
       |      CASE WHEN c.sub = 'lo' THEN k.c_lo ELSE k.c_hi END AS cell,
       |      c.dim, c.x_u
       |    FROM coords c JOIN codes k USING (vec_id))
       |  GROUP BY 1, 2, 3),
       |pr AS (SELECT vec_id AS query_id, sub, dim, x_u AS q_u
       |  FROM coords WHERE vec_id < $AdcProbes),
       |lut AS (SELECT query_id, sub, cell,
       |    sum(CAST(q_u - m_u AS HUGEINT) * (q_u - m_u)) AS d
       |  FROM pr JOIN recon USING (sub, dim) GROUP BY 1, 2, 3),
       |cand AS (SELECT p.query_id, k.vec_id, k.c_lo, k.c_hi
       |  FROM codes k
       |  JOIN (SELECT vec_id AS query_id, ccell FROM codes
       |        WHERE vec_id < $AdcProbes) p
       |    ON k.ccell = p.ccell AND k.vec_id != p.query_id),
       |adc AS (SELECT c.query_id, c.vec_id, CAST(l.d + h.d AS BIGINT) AS adc_u
       |  FROM cand c
       |  JOIN lut l ON l.query_id = c.query_id AND l.sub = 'lo'
       |    AND l.cell = c.c_lo
       |  JOIN lut h ON h.query_id = c.query_id AND h.sub = 'hi'
       |    AND h.cell = c.c_hi),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY query_id
       |    ORDER BY adc_u, vec_id) AS rnk FROM adc),
       |top AS (SELECT query_id, rnk, vec_id, adc_u FROM rk
       |  WHERE rnk <= $AdcTopK)
       |SELECT t.query_id, CAST(t.rnk AS BIGINT) AS rank, t.vec_id, t.adc_u,
       |  CAST(sum(CAST(p.q_u - c.x_u AS HUGEINT) * (p.q_u - c.x_u))
       |    AS BIGINT) AS exact_u
       |FROM top t
       |JOIN coords c ON c.vec_id = t.vec_id
       |JOIN pr p ON p.query_id = t.query_id AND p.sub = c.sub
       |  AND p.dim = c.dim
       |GROUP BY 1, 2, 3, 4
       |ORDER BY 1, 2""".stripMargin
  }

  // -- q232: reciprocal-rank fusion ------------------------------------------
  // Hybrid retrieval's standard merge: the lexical ranking (q81's
  // integer-micro BM25 over the four fixture terms) and the semantic
  // ranking (q22's brute cosine from one probe embedding) fuse by
  // RRF(d) = Σ 1/(60 + rank_d) — computed as 1000000 div (60 + rank)
  // so the fused score is an exact integer on both engines. Both
  // input rankings are top-20 frames (LIMIT-bounded), so the
  // partition-less rank windows and the full-outer merge are k-row
  // driver-grade work riding on two data-sized retrievals that each
  // already have the scale-safe shape (BM25: term-filtered census;
  // cosine: broadcast probe).
  private val RrfTerms = Seq("hash", "join", "spark", "window")
  private val RrfDepth = 20
  private val RrfC = 60
  private val RrfOut = 10
  private val RrfProbe = 0L

  private def q232(spark: SparkSession, sfDir: String): DataFrame = {
    val lex = TextOps.bm25TopK(Tables.read(spark, sfDir, "documents"),
        "doc_id", "text", RrfTerms, RrfDepth)
      .withColumn("r_lex", row_number().over(
        Window.orderBy(col("score_u").desc, col("doc_id"))))
      .select(col("doc_id"), col("r_lex"))
    val emb = Tables.read(spark, sfDir, "embeddings")
    val sem = SimilarityOps.bruteForceTopK(emb,
        emb.where(col("vec_id") === RrfProbe), RrfDepth)
      .select(col("vec_id").as("doc_id"), col("rank").as("r_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        col("r_lex").cast(LongType).as("r_lex"),
        col("r_sem").cast(LongType).as("r_sem"),
        (coalesce(expr(s"1000000 div ($RrfC + r_lex)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfC + r_sem)"), lit(0L)))
          .as("rrf_u"))
      .orderBy(col("rrf_u").desc, col("doc_id"))
      .limit(RrfOut)
  }

  private val q232Oracle: String = {
    val n4c = graft.etl.OracleSql.n4(SimilarityOps.cosineSql("qv", "v"))
    s"""WITH lexall AS (
       |  SELECT * FROM (${TextOps.bm25TopKSql("documents", "doc_id", "text",
      RrfTerms, RrfDepth)}) t),
       |lex AS (SELECT doc_id,
       |    row_number() OVER (ORDER BY score_u DESC, doc_id) AS r_lex
       |  FROM lexall),
       |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM c
       |  WHERE vec_id = $RrfProbe),
       |scored AS (SELECT vec_id, $n4c AS cos
       |  FROM c, q WHERE vec_id != query_id),
       |semall AS (SELECT vec_id AS doc_id,
       |    row_number() OVER (ORDER BY cos DESC, vec_id) AS r_sem
       |  FROM scored),
       |sem AS (SELECT doc_id, r_sem FROM semall WHERE r_sem <= $RrfDepth),
       |f AS (SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       |    CAST(r_lex AS BIGINT) AS r_lex, CAST(r_sem AS BIGINT) AS r_sem
       |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, r_lex, r_sem,
       |  CAST(coalesce(1000000 // ($RrfC + r_lex), 0)
       |    + coalesce(1000000 // ($RrfC + r_sem), 0) AS BIGINT) AS rrf_u
       |FROM f
       |ORDER BY rrf_u DESC, doc_id LIMIT $RrfOut""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q229_tpch_q5", q229, Some(q229Oracle)),
    QueryDef("q230_ivfpq_adc", q230, Some(q230Oracle)),
    QueryDef("q231_kruskal_wallis", q231, Some(q231Oracle)),
    QueryDef("q232_rrf_fusion", q232, Some(q232Oracle)))
}
