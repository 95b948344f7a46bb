package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}
import graft.ops._

/** Round-12 tenth wave: the log-rank test (the between-cohort
  * comparison q124's Kaplan–Meier curves owed) and MRR / hit@k (the
  * first-relevant-rank retrieval eval complementing q263's NDCG).
  */
object Round12jQueries {

  // -- q275: log-rank test between fulfilment cohorts -----------------------------
  // Do urgent-class orders ship on a different schedule? q124's
  // time-to-first-ship derivation (same censoring rule), split into
  // urgent (1/2) vs normal (3/4/5) priority cohorts, compared by the
  // standard log-rank: at every event day, observed group-1 deaths vs
  // the risk-set-proportional expectation. Per-day terms are fixed
  // IEEE expressions over exact integer censuses, each landed on a
  // 1e-6 grid BEFORE the cross-day sum (the q116/q137 micro-grid
  // discipline — double sums over a day domain are reduce-order-
  // private; integer sums are not). The day-domain window is the
  // q124 precedent: a census of DAYS, bounded, not data-sized.
  private def q275(spark: SparkSession, sfDir: String): DataFrame = {
    val firstShip = Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey")).agg(min(col("l_shipdate")).as("ship"))
    val obs = Tables.read(spark, sfDir, "orders")
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .select(datediff(to_date(col("ship")), to_date(col("o_orderdate")))
        .cast("long").as("dur"),
        (col("o_orderkey") % 5 =!= 0).as("evt"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
          .as("g1"))
      .select(when(col("evt"), col("dur"))
        .otherwise(least(col("dur"), lit(30L))).as("t"), col("evt"),
        col("g1"))
    val census = obs.groupBy("t").agg(
        sum(when(col("evt"), col("g1")).otherwise(0L)).as("d1"),
        sum(when(col("evt"), 1L).otherwise(0L)).as("d"),
        sum(col("g1")).as("a1"),
        count(lit(1)).as("a"))
    // risk-set prefixes ride the bucketed census machinery (round 16,
    // the q112/q122 rework) — exact on any cut placement, and the time
    // domain never funnels through one window task even when it is
    // continuous rather than this query's bounded day grain
    val cum = LayoutOps.censusCum(census, "t", Seq("a1", "a"),
      inclusive = true)
    val tot = cum.agg(sum(col("a1")).as("n1_tot"),
      sum(col("a")).as("n_tot"), sum(col("d1")).as("e1"),
      (sum(col("d")) - sum(col("d1"))).as("e0"))
    val risk = cum.crossJoin(broadcast(tot))
      .withColumn("n1", col("n1_tot") - (col("__cum_a1") - col("a1")))
      .withColumn("n", col("n_tot") - (col("__cum_a") - col("a")))
    val D = DoubleType
    val omeTerm = when(col("d") > 0,
      floor((col("d1").cast(D) -
        col("d").cast(D) * col("n1").cast(D) / col("n").cast(D))
        * lit(1000000.0) + lit(0.5)).cast(LongType)).otherwise(0L)
    val vTerm = when(col("d") > 0 && col("n") > 1,
      floor(col("d").cast(D) * (col("n1").cast(D) / col("n").cast(D)) *
        (lit(1.0) - col("n1").cast(D) / col("n").cast(D)) *
        ((col("n") - col("d")).cast(D) / (col("n") - 1).cast(D))
        * lit(1000000.0) + lit(0.5)).cast(LongType)).otherwise(0L)
    risk.select(col("n1_tot"), (col("n_tot") - col("n1_tot")).as("n0_tot"),
        col("e1"), col("e0"), omeTerm.as("ome"), vTerm.as("v"))
      .groupBy("n1_tot", "n0_tot", "e1", "e0")
      .agg(sum(col("ome")).as("ome_u"), sum(col("v")).as("v_u"))
      .select(col("n1_tot"), col("n0_tot"), col("e1"), col("e0"),
        col("ome_u"), col("v_u"),
        Norm.n4((col("ome_u").cast(D) * col("ome_u").cast(D)) /
          (col("v_u").cast(D) * lit(1000000.0))).as("chi2_n4"))
  }

  private val q275Oracle: String =
    s"""WITH obs AS (
       |  SELECT CASE WHEN o_orderkey % 5 <> 0 THEN dur
       |              ELSE least(dur, 30) END AS t,
       |    o_orderkey % 5 <> 0 AS evt,
       |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |         THEN 1 ELSE 0 END AS g1
       |  FROM (SELECT o.o_orderkey, o.o_orderpriority,
       |          CAST(datediff('day', CAST(o.o_orderdate AS DATE),
       |            CAST(s.ship AS DATE)) AS BIGINT) AS dur
       |        FROM orders o
       |        JOIN (SELECT l_orderkey, min(l_shipdate) AS ship
       |              FROM lineitem GROUP BY 1) s
       |          ON o.o_orderkey = s.l_orderkey)),
       |census AS (SELECT t,
       |    CAST(sum(CASE WHEN evt THEN g1 ELSE 0 END) AS BIGINT) AS d1,
       |    CAST(sum(CASE WHEN evt THEN 1 ELSE 0 END) AS BIGINT) AS d,
       |    CAST(sum(g1) AS BIGINT) AS a1,
       |    count(*) AS a
       |  FROM obs GROUP BY 1),
       |tot AS (SELECT CAST(sum(a1) AS BIGINT) AS n1_tot,
       |    CAST(sum(a) AS BIGINT) AS n_tot,
       |    CAST(sum(d1) AS BIGINT) AS e1,
       |    CAST(sum(d) - sum(d1) AS BIGINT) AS e0 FROM census),
       |risk AS (SELECT t, d1, d,
       |    n1_tot - CAST(coalesce(sum(a1) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS n1,
       |    n_tot - CAST(coalesce(sum(a) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS BIGINT) AS n,
       |    n1_tot, n_tot, e1, e0
       |  FROM census CROSS JOIN tot),
       |terms AS (SELECT n1_tot, n_tot - n1_tot AS n0_tot, e1, e0,
       |    CASE WHEN d > 0 THEN CAST(floor((CAST(d1 AS DOUBLE)
       |      - CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END AS ome,
       |    CASE WHEN d > 0 AND n > 1 THEN CAST(floor(CAST(d AS DOUBLE)
       |      * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
       |      * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE))
       |      * 1000000.0 + 0.5) AS BIGINT) ELSE 0 END AS v
       |  FROM risk),
       |agg AS (SELECT n1_tot, n0_tot, e1, e0,
       |    CAST(sum(ome) AS BIGINT) AS ome_u,
       |    CAST(sum(v) AS BIGINT) AS v_u
       |  FROM terms GROUP BY 1, 2, 3, 4)
       |SELECT n1_tot, n0_tot, e1, e0, ome_u, v_u,
       |  ${graft.etl.OracleSql.n4(
      "(CAST(ome_u AS DOUBLE) * CAST(ome_u AS DOUBLE)) " +
        "/ (CAST(v_u AS DOUBLE) * 1000000.0)")} AS chi2_n4
       |FROM agg""".stripMargin

  // -- q276: MRR / hit@k retrieval eval --------------------------------------------
  // The first-relevant-rank view NDCG blurs: per query, the rank of
  // the FIRST label match in the exact top-10, reciprocal rank as the
  // integer pick 1e6 div rank, and hit@1/5/10 flags. A query whose
  // class never appears in the top-10 scores rr = 0 with a NULL rank
  // (distinct from rank-10 relevance). Everything after q22's
  // broadcast scan rides ≤ k rows per query.
  private val MrrK = 10
  private val MrrQueries = 32

  private def q276(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
    val labels = emb.select(col("vec_id").as("nid"), col("label").as("nl"))
    val qs = emb.where(col("vec_id") < MrrQueries)
    val qLabels = qs.select(col("vec_id").as("query_id"),
      col("label").as("ql"))
    val firstRel = SimilarityOps.bruteForceTopK(emb, qs, MrrK)
      .join(broadcast(qLabels), "query_id")
      .join(labels, col("vec_id") === col("nid"))
      .where(col("nl") === col("ql"))
      .groupBy("query_id")
      .agg(min(col("rank")).cast(LongType).as("first_rank"))
    qLabels.select("query_id")
      .join(firstRel, Seq("query_id"), "left")
      .select(col("query_id"), col("first_rank"),
        coalesce(expr("1000000 div first_rank"), lit(0L)).as("rr_u"),
        coalesce((col("first_rank") === 1L).cast(LongType), lit(0L))
          .as("hit1"),
        coalesce((col("first_rank") <= 5L).cast(LongType), lit(0L))
          .as("hit5"),
        when(col("first_rank").isNotNull, 1L).otherwise(0L).as("hit10"))
      .orderBy("query_id")
  }

  private val q276Oracle: String = {
    import OracleHelpers.n4
    s"""WITH c AS (SELECT vec_id, label,
       |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT vec_id AS query_id, label AS ql, v AS qv
       |      FROM c WHERE vec_id < $MrrQueries),
       |scored AS (SELECT query_id, ql, vec_id, label,
       |    ${n4(SimilarityOps.cosineSql("qv", "v"))} AS cos
       |  FROM c, q WHERE vec_id != query_id),
       |ranked AS (SELECT query_id, ql, label, row_number() OVER (
       |    PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
       |  FROM scored),
       |fr AS (SELECT query_id, CAST(min(rank) AS BIGINT) AS first_rank
       |  FROM ranked WHERE rank <= $MrrK AND label = ql GROUP BY 1)
       |SELECT q.query_id, fr.first_rank,
       |  CAST(coalesce(1000000 // first_rank, 0) AS BIGINT) AS rr_u,
       |  CAST(CASE WHEN first_rank = 1 THEN 1 ELSE 0 END AS BIGINT) AS hit1,
       |  CAST(CASE WHEN first_rank <= 5 THEN 1 ELSE 0 END AS BIGINT) AS hit5,
       |  CAST(CASE WHEN first_rank IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
       |    AS hit10
       |FROM q LEFT JOIN fr ON fr.query_id = q.query_id
       |ORDER BY q.query_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q275_logrank", q275, Some(q275Oracle)),
    QueryDef("q276_mrr_hitk", q276, Some(q276Oracle)))
}
