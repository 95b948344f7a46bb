package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

import graft.ops.{MixOps, SimilarityOps}

/** Round-12 second wave: the IVF recall grader (closing the one
  * ungraded approximation, VERDICT r11 #8), two more TPC-H join
  * shapes (Q10, Q18), a deterministic Poisson-bootstrap confidence
  * interval, and a kNN label-noise audit over the embeddings table.
  */
object Round12bQueries {

  private val dec = DecimalType(38, 0)

  // -- q240: IVF recall grader -------------------------------------------------
  // q154's discipline applied to the OTHER approximate index: recall@5
  // of the q49-configuration IVF search (8 fixed centroids, nprobe=2)
  // against exact brute-force truth on a fixed 25-query panel. Both
  // sides are k-row frames per query, so the eval costs
  // O(|queries|·k) beyond the two retrievals; the macro recall (exact
  // integer ppm) rides every row as the headline next to the
  // per-query breakdown.
  private val IvfRk = 5
  private val IvfRq = 25
  private val IvfCents = 8
  private val IvfProbe = 2

  private def q240(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
    val queries = emb.where(col("vec_id") < IvfRq)
    val truth = SimilarityOps.bruteForceTopK(emb, queries, IvfRk)
      .select(col("query_id"), col("vec_id"))
      .localCheckpoint(true) // hit join + per-query sizes
    val approx = SimilarityOps.ivfTopK(emb, queries, IvfRk,
        nCentroids = IvfCents, nprobe = IvfProbe)
      .select(col("query_id"), col("vec_id"))
    val hits = approx.join(truth, Seq("query_id", "vec_id"))
      .groupBy("query_id").agg(count(lit(1)).as("__h"))
    val per = truth.groupBy("query_id").agg(count(lit(1)).as("n_true"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("n_true"),
        coalesce(col("__h"), lit(0L)).as("n_hits"))
      .localCheckpoint(true) // rows + the macro rollup
    val macroA = per.agg(
      expr("sum(n_hits) * 1000000 div sum(n_true)").as("macro_recall_ppm"))
    per.crossJoin(broadcast(macroA))
      .select(col("query_id"), col("n_true"), col("n_hits"),
        Norm.n4(col("n_hits").cast("double") / col("n_true").cast("double"))
          .as("recall_n4"),
        col("macro_recall_ppm"))
      .orderBy("query_id")
  }

  private val q240Oracle: String = {
    val cs = OracleHelpers.n4(SimilarityOps.cosineSql("b.v", "cents.cv"))
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv FROM c
       |      WHERE vec_id < $IvfRq),
       |bscored AS (SELECT query_id, vec_id,
       |  ${n4(SimilarityOps.cosineSql("qv", "v"))} AS cos
       |  FROM c, q WHERE vec_id != query_id),
       |truth AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rank FROM bscored)
       |  WHERE rank <= $IvfRk),
       |cents AS (SELECT vec_id AS cid, v AS cv FROM c
       |  ORDER BY vec_id LIMIT $IvfCents),
       |ac AS (SELECT vec_id, v, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid ASC)
       |    AS rn
       |  FROM (SELECT b.vec_id, b.v, cents.cid, $cs AS cs
       |        FROM c b CROSS JOIN cents) s),
       |assign AS (SELECT vec_id, v, cid AS cell FROM ac WHERE rn = 1),
       |qa AS (SELECT vec_id AS query_id, v AS qv, cid AS cell
       |       FROM ac WHERE vec_id < $IvfRq AND rn <= $IvfProbe),
       |cand AS (SELECT query_id, vec_id, qv, v
       |         FROM assign JOIN qa USING(cell) WHERE vec_id != query_id),
       |ascored AS (SELECT query_id, vec_id,
       |  ${n4(SimilarityOps.cosineSql("qv", "v"))} AS cos FROM cand),
       |approx AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rank FROM ascored)
       |  WHERE rank <= $IvfRk),
       |hits AS (SELECT query_id, count(*) AS h
       |  FROM approx JOIN truth USING (query_id, vec_id) GROUP BY 1),
       |per AS (SELECT t.query_id, count(*) AS n_true,
       |    CAST(coalesce(any_value(h), 0) AS BIGINT) AS n_hits
       |  FROM truth t LEFT JOIN hits USING (query_id) GROUP BY 1),
       |m AS (SELECT CAST(sum(n_hits) * 1000000 // sum(n_true) AS BIGINT)
       |    AS macro_recall_ppm FROM per)
       |SELECT query_id, n_true, n_hits,
       |  ${n4("CAST(n_hits AS DOUBLE) / CAST(n_true AS DOUBLE)")}
       |    AS recall_n4,
       |  macro_recall_ppm
       |FROM per CROSS JOIN m
       |ORDER BY query_id""".stripMargin
  }

  // -- q241: TPC-H Q10 (returned-item reporting) -------------------------------
  // The 4-table "who returned the most revenue last quarter" shape:
  // quarter-filtered orders (partition-prunable predicate) take the
  // ONE fact-fact shuffle against return-flagged lineitem; customer
  // attaches per-order and nation broadcasts. Revenue on q170/q229's
  // exact integer grid — cents × (100 − discount-cents) — so the
  // top-20 cut is integer-deterministic. TakeOrdered (orderBy+limit),
  // never a global sort.
  private val Q10Start = "1996-01-01"
  private val Q10End = "1996-04-01"
  private val Q10TopK = 20

  private def q241(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.read(spark, sfDir, "orders")
      .where(to_date(col("o_orderdate")) >= lit(Q10Start).cast("date") &&
        to_date(col("o_orderdate")) < lit(Q10End).cast("date"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.read(spark, sfDir, "lineitem")
      .where(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (floor(col("l_extendedprice") * 100 + lit(0.5)).cast(LongType) *
          (lit(100L) - floor(col("l_discount") * 100 + lit(0.5))
            .cast(LongType))).as("rev_u"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.read(spark, sfDir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.read(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(sum(col("rev_u")).as("revenue_u"))
      .orderBy(col("revenue_u").desc, col("c_custkey").asc)
      .limit(Q10TopK)
  }

  private val q241Oracle: String =
    s"""SELECT c_custkey, c_name, c_acctbal, n_name,
       |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
       |    * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT)
       |    AS revenue_u
       |FROM lineitem
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation ON n_nationkey = c_nationkey
       |WHERE l_returnflag = 'R'
       |  AND CAST(o_orderdate AS DATE) >= DATE '$Q10Start'
       |  AND CAST(o_orderdate AS DATE) < DATE '$Q10End'
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue_u DESC, c_custkey ASC
       |LIMIT $Q10TopK""".stripMargin

  // -- q242: TPC-H Q18 (large-volume customers) --------------------------------
  // The HAVING-over-aggregate + semi-join shape: orders whose total
  // line quantity clears a threshold, re-joined to customer detail.
  // Quantities cast to BIGINT before summing (they are integral in
  // the fixture; a double sum would be reduce-order-private). The
  // qualifying-key frame is aggregate-sized and semi-joins orders
  // BEFORE the customer attach — at 100 TB the key set is the only
  // state that crosses stages twice. Top-100 by order value,
  // integer-tie-broken.
  private val Q18MinQty = 200L
  private val Q18TopK = 100

  private def q242(spark: SparkSession, sfDir: String): DataFrame = {
    val perOrder = Tables.read(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("sum_qty"))
      .where(col("sum_qty") > Q18MinQty)
    Tables.read(spark, sfDir, "orders")
      .join(perOrder, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(Tables.read(spark, sfDir, "customer")
          .select(col("c_custkey"), col("c_name"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("o_orderdate"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType)
          .as("totalprice_u"),
        col("sum_qty"))
      .orderBy(col("totalprice_u").desc, col("o_orderkey").asc)
      .limit(Q18TopK)
  }

  private val q242Oracle: String =
    s"""WITH big AS (SELECT l_orderkey,
       |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING sum(CAST(l_quantity AS BIGINT)) > $Q18MinQty)
       |SELECT c_name, c_custkey, o_orderkey,
       |  CAST(o_orderdate AS DATE) AS o_orderdate,
       |  CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS totalprice_u,
       |  sum_qty
       |FROM orders
       |JOIN big ON l_orderkey = o_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |ORDER BY totalprice_u DESC, o_orderkey ASC
       |LIMIT $Q18TopK""".stripMargin

  // -- q243: Poisson-bootstrap confidence interval -----------------------------
  // The distributed bootstrap (Poisson(1) resample weights instead of
  // multinomial draws — the standard trick: no global coordination,
  // every row draws independently) made fully DETERMINISTIC: replica
  // r's weight for a row is the Poisson(1) inverse-CDF evaluated at
  // the two-round Lehmer hash of (orderkey, seed+r), with the CDF cut
  // points baked as INTEGER thresholds (floor(cum·P)) — computed once
  // driver-side and rendered into both engines, so there is no
  // cross-engine transcendental anywhere at runtime. The fan-out is
  // map-side (explode of a 32-literal array); each replica's weighted
  // sum/count pre-aggregates per partition into a 32-row frame, and
  // the 2.5/97.5 percentile over 32 replica means is driver-grade.
  private val BootReps = 32
  private val BootSeed = 712L

  /** Integer thresholds of the Poisson(1) CDF on the [0, P) hash
    * grid: weight w = #{k : u ≥ t_k} (support capped at 8, where the
    * tail mass is ~1e-5 of P).
    */
  private[queries] val bootThresholds: Seq[Long] = {
    val e = math.exp(-1.0)
    val fact = (0 to 7).map(k => (1 to k).foldLeft(1.0)(_ * _.toDouble))
    val cum = fact.map(e / _).scanLeft(0.0)(_ + _).tail
    cum.map(c => math.floor(c * MixOps.P).toLong)
  }

  private def q243(spark: SparkSession, sfDir: String): DataFrame = {
    val base = Tables.read(spark, sfDir, "orders")
      .select(col("o_orderkey").as("id"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast(LongType).as("x_u"))
      .localCheckpoint(true) // full-sample mean + the 32-replica fan
    val fullMean = base.agg(
      expr("sum(cast(x_u as decimal(38,0))) * 100 div count(1)")
        .as("mean_full_u"))
    val fan = base.select(col("id"), col("x_u"),
      explode(array((0 until BootReps).map(lit): _*)).as("rep"))
    val h1 = ((col("id") % MixOps.P + (lit(BootSeed) + col("rep"))) *
      lit(48271L)) % MixOps.P
    val u = ((h1 + lit(1L)) * lit(69621L)) % MixOps.P
    val w = bootThresholds.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(u >= lit(t), 1L).otherwise(0L)
    }
    val perRep = fan.select(col("rep"), w.as("w"), col("x_u"))
      .groupBy("rep")
      .agg(sum(col("w")).as("n_r"),
        sum(col("w").cast(dec) * col("x_u")).as("s_r"))
      .select(col("rep"), expr("s_r * 100 div n_r").as("mean_u"))
    perRep.agg(count(lit(1)).as("n_reps"),
        element_at(percentile(col("mean_u"), array(lit(0.025), lit(0.975))),
          1).as("__lo"),
        element_at(percentile(col("mean_u"), array(lit(0.025), lit(0.975))),
          2).as("__hi"))
      .crossJoin(broadcast(fullMean))
      .select(col("n_reps"), col("mean_full_u"),
        Norm.n4(col("__lo")).as("ci_lo_n4"),
        Norm.n4(col("__hi")).as("ci_hi_n4"))
  }

  private val q243Oracle: String = {
    val p = MixOps.P
    val thr = bootThresholds
    val h1 = s"(((id % $p + ($BootSeed + rep)) * 48271) % $p)"
    val u = s"((($h1 + 1) * 69621) % $p)"
    val w = thr.map(t => s"(CASE WHEN $u >= $t THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH base AS (SELECT o_orderkey AS id,
       |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS x_u
       |  FROM orders),
       |fm AS (SELECT CAST(sum(CAST(x_u AS HUGEINT)) * 100 // count(*)
       |    AS BIGINT) AS mean_full_u FROM base),
       |fan AS (SELECT id, x_u, CAST(r.i AS BIGINT) AS rep
       |  FROM base, range(0, $BootReps) r(i)),
       |wt AS (SELECT rep, x_u, CAST($w AS BIGINT) AS w FROM fan),
       |pr AS (SELECT rep,
       |    CAST(sum(CAST(w AS HUGEINT) * x_u) * 100 // sum(w) AS BIGINT)
       |      AS mean_u
       |  FROM wt GROUP BY 1),
       |ci AS (SELECT count(*) AS n_reps,
       |    ${OracleHelpers.n4("quantile_cont(mean_u, 0.025)")} AS ci_lo_n4,
       |    ${OracleHelpers.n4("quantile_cont(mean_u, 0.975)")} AS ci_hi_n4
       |  FROM pr)
       |SELECT n_reps, mean_full_u, ci_lo_n4, ci_hi_n4
       |FROM ci CROSS JOIN fm""".stripMargin
  }

  // -- q244: kNN label-noise audit ---------------------------------------------
  // The confident-learning-style data-quality probe every labeled
  // training set needs: for a fixed 64-vector audit panel, do the 5
  // nearest neighbors (exact cosine, the q154 bounded-brute pattern)
  // agree with the row's own label? A majority-disagree row is
  // flagged noisy; the panel-level noisy rate rides along in ppm.
  // The panel is CONSTANT as the corpus scales — the corpus pass is
  // one broadcast-probe scan, never an all-pairs structure.
  private val NoiseProbes = 64
  private val NoiseK = 5

  private def q244(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.read(spark, sfDir, "embeddings")
    val probes = emb.where(col("vec_id") < NoiseProbes)
    val nn = SimilarityOps.bruteForceTopK(emb, probes, NoiseK)
    val per = nn
      .join(emb.select(col("vec_id"), col("label").as("nb_label")), "vec_id")
      .join(broadcast(probes.select(col("vec_id").as("query_id"),
        col("label").as("q_label"))), "query_id")
      .groupBy("query_id", "q_label")
      .agg(count(lit(1)).as("k_found"),
        sum(when(col("nb_label") === col("q_label"), 1L).otherwise(0L))
          .as("n_same"))
      .localCheckpoint(true) // rows + the panel rollup
    val overall = per.agg(
      expr("sum(case when n_same * 2 < k_found then 1 else 0 end)" +
        " * 1000000 div count(1)").as("noisy_ppm"))
    per.crossJoin(broadcast(overall))
      .select(col("query_id"), col("q_label"), col("k_found"),
        col("n_same"), (col("n_same") * 2 < col("k_found")).as("noisy"),
        col("noisy_ppm"))
      .orderBy("query_id")
  }

  private val q244Oracle: String = {
    val n4 = graft.etl.OracleSql.n4 _
    s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label
       |  FROM embeddings),
       |q AS (SELECT vec_id AS query_id, v AS qv, label AS q_label
       |  FROM c WHERE vec_id < $NoiseProbes),
       |scored AS (SELECT query_id, vec_id,
       |  ${n4(SimilarityOps.cosineSql("qv", "v"))} AS cos
       |  FROM c, q WHERE vec_id != query_id),
       |nn AS (SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
       |      ORDER BY cos DESC, vec_id ASC) AS rank FROM scored)
       |  WHERE rank <= $NoiseK),
       |per AS (SELECT query_id, any_value(q_label) AS q_label,
       |    count(*) AS k_found,
       |    CAST(sum(CASE WHEN c.label = q.q_label THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_same
       |  FROM nn JOIN c USING (vec_id) JOIN q USING (query_id)
       |  GROUP BY 1),
       |o AS (SELECT CAST(sum(CASE WHEN n_same * 2 < k_found THEN 1 ELSE 0
       |    END) * 1000000 // count(*) AS BIGINT) AS noisy_ppm FROM per)
       |SELECT query_id, q_label, k_found, n_same,
       |  n_same * 2 < k_found AS noisy, noisy_ppm
       |FROM per CROSS JOIN o
       |ORDER BY query_id""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q240_ivf_recall", q240, Some(q240Oracle)),
    QueryDef("q241_tpch_q10", q241, Some(q241Oracle)),
    QueryDef("q242_tpch_q18", q242, Some(q242Oracle)),
    QueryDef("q243_bootstrap_ci", q243, Some(q243Oracle)),
    QueryDef("q244_label_noise", q244, Some(q244Oracle)))
}
